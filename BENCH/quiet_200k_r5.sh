#!/bin/bash
# Round-5 scaling evidence — run FIRST in the fresh session window per
# BENCH/BASELINE.md methodology note (aggregate-CPU burst budget is full
# at session start; see round-3 addendum).  Same shape as
# quiet_200k_first.sh but writes *_r5.json outputs.
cd /root/repo
chain_control() {
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
echo "chain_control_pre: $(chain_control)"
echo "agg_control_pre: $(python BENCH/cpu_control.py 1200)"
SCALING_OUT=scaling_200k_r5.json python BENCH/scaling.py 200000 ${REPS_200K:-2} 2>&1 | tail -4
echo "agg_control_mid: $(python BENCH/cpu_control.py 1200)"
if [ "${RUN_1M:-1}" = "1" ]; then
  SCALING_OUT=scaling_1m_r5.json python BENCH/scaling.py 1000000 1 2>&1 | tail -4
  echo "agg_control_post: $(python BENCH/cpu_control.py 1200)"
fi
echo "chain_control_post: $(chain_control)"
echo QUIET_RUN_DONE
