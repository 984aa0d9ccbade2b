import random, string, sys, types
sys.path.insert(0, "/root/repo")
def load_ref():
    sys.path.insert(0, "/root/reference/src")
    _cr = types.ModuleType("class_registry"); _ep = types.ModuleType("class_registry.entry_points")
    class _F:
        def __init__(self, *a, **k): pass
        def __class_getitem__(cls, item): return cls
        def __iter__(self): return iter(())
    _cr.ClassRegistry = _F; _ep.EntryPointClassRegistry = _F; _cr.entry_points = _ep
    sys.modules.setdefault("class_registry", _cr); sys.modules.setdefault("class_registry.entry_points", _ep)
    import filters as ref
    return ref
ref = load_ref()
import filters_spark as fs
from filters_spark.core.compiler import attach_chain
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[16]")
         .config("spark.sql.shuffle.partitions","16")
         .config("spark.sql.session.timeZone","UTC")
         .config("spark.ui.enabled","false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
SEED = random.SystemRandom().randint(0, 2**31)
rng = random.Random(SEED)
print("seed:", SEED, flush=True)

ALPHA = string.ascii_letters + string.digits + "+/"
def gen():
    k = rng.randint(0, 5)
    if k == 0:  # valid-ish base64 with random padding
        n = rng.randint(0, 18)
        s = "".join(rng.choice(ALPHA) for _ in range(n)) + "=" * rng.randint(0, 3)
    elif k == 1:  # base64 with '=' sprinkled anywhere
        chars = [rng.choice(ALPHA + "===") for _ in range(rng.randint(0, 16))]
        s = "".join(chars)
    elif k == 2:  # whitespace / url-safe / junk mixed in
        s = "".join(rng.choice(ALPHA + "-_ \t\n\r=!@#") for _ in range(rng.randint(0, 16)))
    elif k == 3:  # real encodings, sometimes chopped
        import base64 as b
        raw = bytes(rng.randint(0, 255) for _ in range(rng.randint(0, 12)))
        s = b.b64encode(raw).decode()
        if rng.random() < 0.4:
            s = s[: rng.randint(0, len(s))]
    elif k == 4:
        s = "".join(chr(rng.randint(1, 255)) for _ in range(rng.randint(0, 10)))
    else:
        s = rng.choice(["", "=", "==", "===", "====", "A", "AB", "ABC", "AB==CD==", "A=B=C=D=", "+/+/", "----"])
    return s.encode("utf-8", "ignore")

def ref_apply(value):
    r = ref.FilterRunner(ref.Base64Decode(), value)
    return r.cleaned_data, sorted(c for cs in r.error_codes.values() for c in cs)

BATCH = 600
vals = [gen() for _ in range(BATCH)]
exp = [ref_apply(v) for v in vals]
df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "i int, v binary")
out, val_col, viol_col = attach_chain(df, "v", fs.Base64Decode(), key="")
got = {r["i"]: (bytes(r[val_col]) if r[val_col] is not None else None,
                sorted(x["code"] for x in r[viol_col]))
       for r in out.select("i", val_col, viol_col).collect()}
bad = 0
for i, (v, e) in enumerate(zip(vals, exp)):
    g = got[i]
    ev = bytes(e[0]) if isinstance(e[0], (bytes, bytearray)) else e[0]
    if (ev, e[1]) != g:
        bad += 1
        if bad <= 6:
            print(f"MISMATCH {v!r}: ref {(ev, e[1])} vs eng {g}")
print(f"base64 bytes: {BATCH} cases, {bad} mismatches")
spark.stop()
