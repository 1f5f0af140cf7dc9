"""Dev helper: dump every queries() result schema at sf0.001 as a python
literal spec {name: [(col, simple_type), ...]} for the fused-query builder."""
import os, sys, json, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __spark_entry__ as entrymod
from grandiso_networkx_spark.session import get_spark

def main(sf_dir):
    spark = get_spark(app_name="dump-specs", shuffle_partitions=8)
    out = {}
    for name, fn in entrymod.queries().items():
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            out[name] = [(f.name, f.dataType.simpleString()) for f in df.schema.fields]
            n = df.count()
        except Exception as exc:
            out[name] = [("__error__", f"{type(exc).__name__}: {exc}")]
            n = -1
        print(f"{name}\t{n}\t{time.time()-t0:.1f}s\t{out[name]}", flush=True)
    with open("/root/repo/scripts/_specs.json", "w") as f:
        json.dump(out, f, indent=1)
    spark.stop()

if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
