#!/bin/bash
# Round-3 scaling evidence, ordered for this VM's aggregate-CPU burst
# budget: the HEADLINE 200k pair runs FIRST in the fresh window (the
# round-3 first attempt ran the 1M pair first and burned ~17 min of
# all-core budget; the 200k pair then measured local[32] SLOWER than
# local[8] while single-core controls stayed flat — see
# quiet_run_r3_attempt1.log).  Aggregate-CPU probes (cpu_control.py)
# bracket each pair so throttle is distinguishable from regression.
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
SCALING_OUT=scaling_200k_r3.json python BENCH/scaling.py 200000 ${REPS_200K:-2} 2>&1 | tail -4
echo "agg_control_mid: $(python BENCH/cpu_control.py 1200)"
if [ "${RUN_1M:-0}" = "1" ]; then
  SCALING_OUT=scaling_1m_r3.json python BENCH/scaling.py 1000000 1 2>&1 | tail -4
  echo "agg_control_post: $(python BENCH/cpu_control.py 1200)"
fi
echo "chain_control_post: $(chain_control)"
echo QUIET_RUN_DONE
