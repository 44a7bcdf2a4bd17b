import os, re, sys, json, collections
sys.path.insert(0, "/root/repo")
from libcolumnfile_spark.registry import REGISTRY
from libcolumnfile_spark.session import get_spark
from libcolumnfile_spark.queries import _release_pins

spark = get_spark("plan-sweep")
spark.sparkContext.setLogLevel("ERROR")
SF = "/root/testdata/sf0.1"
out_dir = "_work/plans_all"

findings = collections.defaultdict(list)
for name in sorted(REGISTRY):
    try:
        df = REGISTRY[name].spark_fn(spark, SF)
        plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    except Exception as exc:
        findings["build_error"].append((name, str(exc)[:120]))
        continue
    finally:
        spark.catalog.clearCache(); _release_pins()
    with open(f"{out_dir}/{name}.txt", "w") as f:
        f.write(plan)
    # physical section only (before the numbered operator details)
    phys = plan.split("\n\n", 1)[0]
    # (a) duplicated UDF evaluation: same udf name in >1 EvalPython node line
    udf_nodes = re.findall(r"(?:Batch|Arrow)EvalPython \[([a-zA-Z_0-9]+)\(", plan)
    dup_udfs = [u for u, c in collections.Counter(udf_nodes).items() if c > 1]
    if dup_udfs:
        findings["udf_dup"].append((name, dup_udfs))
    # (b) scalar python udf (row-at-a-time)
    if "BatchEvalPython" in plan:
        findings["batch_eval"].append((name, plan.count("BatchEvalPython")))
    # (c) cartesian
    if "CartesianProduct" in phys:
        findings["cartesian"].append((name, phys.count("CartesianProduct")))
    # (d) SinglePartition exchange
    if "Exchange SinglePartition" in plan:
        findings["single_part"].append((name, plan.count("Exchange SinglePartition")))
    # (e) repeated parquet scans of the same table in the LIVE plan (outside InMemoryRelation builds)
    live = []
    in_imr = 0
    for line in phys.splitlines():
        live.append(line)
    scans = re.findall(r"Scan parquet\s*\S*\[?([a-z_]*)", phys)
    n_scans = phys.count("Scan parquet")
    if n_scans >= 4:
        findings["many_scans"].append((name, n_scans))
    # (f) BNLJ
    if "BroadcastNestedLoopJoin" in phys:
        findings["bnlj"].append((name, phys.count("BroadcastNestedLoopJoin")))

print(json.dumps({k: sorted(v) for k, v in findings.items()}, indent=1, default=str))
spark.stop()
