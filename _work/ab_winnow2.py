import sys, time
sys.path.insert(0, "/root/repo")
exec(open("_work/ab_winnow.py").read().split("# parity via collect")[0])
run(winnow_query, old_kernel); run(winnow_query, new_kernel)
olds, news = [], []
for _ in range(10):
    t0 = time.perf_counter(); run(winnow_query, old_kernel); olds.append(time.perf_counter() - t0)
    t0 = time.perf_counter(); run(winnow_query, new_kernel); news.append(time.perf_counter() - t0)
import statistics
print("old:", " ".join(f"{x:.2f}" for x in olds))
print("new:", " ".join(f"{x:.2f}" for x in news))
print(f"old min={min(olds):.3f} med={statistics.median(olds):.3f} | new min={min(news):.3f} med={statistics.median(news):.3f}")
spark.stop()
