"""Same-session alternating A/B: num_shards 64 vs 512 on the 3.2M loop.
Same corpus, same seeds, alternating order, best-of-2 per arm."""
import json, sys, tempfile, time
sys.path.insert(0, "/root/repo")
from bench import build_spark
from parsel_spark.plans.crawl import CrawlRun
from parsel_spark.sources.snapshots import SnapshotCatalog
from parsel_spark.sources.synth import (SynthConfig, synth_pages,
    synth_robots, synth_seeds, robots_rows)

spark = build_spark(32); spark.sparkContext.setLogLevel("ERROR")
cfg = SynthConfig(n_pages=3_200_000, n_hosts=800_000, out_degree=12,
                  seed=42, with_images=False, zipf_s=0.5)
pages = CrawlRun.prepare_pages(synth_pages(spark, cfg, num_partitions=64), 64)
robots = synth_robots(spark, cfg, fast=True)
rules = {r["host"]: (tuple(r["deny_prefixes"]), tuple(r["allow_prefixes"]))
         for r in robots_rows(cfg, fast=True)}
seeds = synth_seeds(spark, cfg, n_seeds=800_000, spread=True)

def run_once(shards):
    with tempfile.TemporaryDirectory() as tmp:
        run = CrawlRun(spark, SnapshotCatalog(tmp), pages, robots,
                       num_shards=shards, frontier_partitions=64,
                       checkpoint_interval=3, pages_prepared=True,
                       robots_rules=rules)
        run.initialize(seeds)
        t0 = time.perf_counter()
        tot = [0, 0]
        for m in run.run(3):
            tot[0] += m["dequeued"]; tot[1] += m.get("links_extracted", m["new_urls"])
        return time.perf_counter() - t0, tuple(tot)

# warmup
w = run_once(64)
best = {64: 1e9, 512: 1e9}; totals = {}
for rnd in range(2):
    for shards in (64, 512):
        sec, tot = run_once(shards)
        best[shards] = min(best[shards], sec)
        assert totals.setdefault(shards, tot) == tot, "nondeterministic!"
        print(json.dumps({"round": rnd, "shards": shards, "sec": round(sec,2)}), flush=True)
assert totals[64] == totals[512], f"shard count changed results! {totals}"
out = {"best_64": round(best[64],2), "best_512": round(best[512],2),
       "ratio_512_vs_64": round(best[512]/best[64], 3),
       "totals": totals[64], "warmup_sec": round(w[0],2),
       "design": "same session, alternating arms, best-of-2, 3.2M pages x 3 waves"}
print(json.dumps(out), flush=True)
json.dump(out, open("/root/repo/BENCH/shard_ab.json", "w"), indent=1)
spark.stop()
