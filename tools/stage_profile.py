"""Per-stage wall-time profile of the pipeline at a given core count:

    python tools/stage_profile.py <cores> [n_pages]   (BENCH_HTML_KB env)
"""
import os, sys, time

sys.path.insert(0, "/root/repo")
from serialization_agents_spark.session import get_spark
from serialization_agents_spark import synth
from serialization_agents_spark.operators.extract import with_extracted_text
from serialization_agents_spark.operators.mentions import detect_mentions
from serialization_agents_spark.operators.linking import link_mentions
from serialization_agents_spark.operators.merge import merge_entities, score_alt_forms
from serialization_agents_spark.operators.canonicalize import canonicalize_agents
from serialization_agents_spark.operators.triples import materialize_triples

cores = int(sys.argv[1])
N = int(sys.argv[2]) if len(sys.argv) > 2 else 100000
spark = get_spark(master=f"local[{cores}]", shuffle_partitions=max(cores * 2, 16),
                  extra_conf={"spark.driver.memory": "24g"})
spark.range(10_000_000).selectExpr("sum(id)").collect()

def tick(msg, t0):
    t = time.time(); print(f"[{cores}] {msg}: {t-t0:.1f}s", flush=True); return t

t0 = time.time()
import os as _os
HTML_KB = int(_os.environ.get("BENCH_HTML_KB", "30"))
pages = synth.synth_pages(spark, n_pages=N, n_auth=2000, partitions=cores * 3, html_kb=HTML_KB)
auth = synth.synth_authority(spark, n_auth=2000)
red = synth.synth_redirects(spark)
bl = synth.synth_blacklist(spark)
px = with_extracted_text(pages)
m = detect_mentions(px).persist(); nm = m.count(); t0 = tick(f"gen+extract+mentions {nm}", t0)
linked, _ = link_mentions(m, auth, red, bl)
linked = linked.persist(); nl = linked.count(); t0 = tick(f"linked {nl}", t0)
agents = merge_entities(linked).persist(); na = agents.count(); t0 = tick(f"agents {na}", t0)
canon, it = canonicalize_agents(agents)
canon = score_alt_forms(canon).persist(); nc = canon.count(); t0 = tick(f"canon {nc} it={it}", t0)
tr = materialize_triples(canon, linked); nt = tr.count(); t0 = tick(f"triples {nt}", t0)
print(f"[{cores}] done", flush=True)
