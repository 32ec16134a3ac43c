#!/bin/bash
# Quiet-window scaling evidence (no sleep — invoke when the window is quiet):
# single-core throttle controls bracket the interleaved scaling runs.
cd /root/repo
control() {
python - <<'PY'
import json, time
from php_lucene_analyzer_spark.analysis.chain import analyze_terms
import pyarrow.parquet as pq
texts = pq.read_table('/root/testdata/sf0.1/documents.parquet').to_pydict()['text'][:3000]
analyze_terms("warm up the chain")
t0 = time.time(); n = sum(len(analyze_terms(t)) for t in texts)
print(json.dumps({"sec_per_3000_docs": round(time.time()-t0, 3), "tokens": n}))
PY
}
echo "control_pre: $(control)"
SCALING_OUT=scaling_1m_r2.json python BENCH/scaling.py 1000000 1 2>&1 | tail -3
SCALING_OUT=scaling_200k_r2.json python BENCH/scaling.py 200000 1 2>&1 | tail -3
echo "control_post: $(control)"
echo QUIET_RUN_DONE
