"""Quick local smoke check of the chain compiler."""
from filters_spark.session import get_spark
import filters_spark as fs

spark = get_spark(master="local[4]", shuffle_partitions=4)
rows = [
    ("  hello  world\r\nx ",),
    ("é",),  # NFD e + combining acute -> NFC
    (None,),
    ("",),
    ("x" * 600,),
]
df = spark.createDataFrame(rows, "text string")
out = fs.validate(
    df, {"text": fs.Required() | fs.Unicode() | fs.Strip() | fs.MaxLength(500)}
)
out.show(truncate=50)
out.printSchema()
print(out.collect())
