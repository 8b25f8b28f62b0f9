PY ?= python
# CPU-forced launcher (JAX_PLATFORMS env cannot override the axon sitecustomize)
PYCPU ?= python tools/cpu_python.py

.PHONY: test ingest bench gate trajectories bc ppo ppo-device eval-rl snapshot

test:
	$(PY) -m pytest tests/ -q

ingest:
	$(PY) -m ahrag_tpu.cli.demo samples/mini_films.txt --no-repl

bench:
	$(PY) bench.py

# offline gate: faithfulness floors at the 0.5 no-judge default constant
# (answer_eval parity), so the LLM-judge-assuming 0.6 threshold is lowered here
gate:
	$(PY) -m ahrag_tpu.cli.eval_gate --data samples/mini_questions.jsonl --limit 5 --faith-min 0.5

# v2 quality gate on the template-disjoint frozen dev split, ratcheted to the
# round-3 level (LSA retrieval + structural QA: dev F1 98 as of r3)
gate-v2:
	$(PYCPU) ahrag_tpu.cli.eval_gate --dataset local --data samples/synth_v2_dev.jsonl --limit 100 --f1-min 90 --faith-min 0.9 --out reports/eval_gate_v2_dev_r3.json

# v3 gate: comparison/arithmetic/3-entity-bridge families included
gate-v3:
	$(PYCPU) ahrag_tpu.cli.eval_gate --dataset local --data samples/synth_v3_dev.jsonl --limit 120 --f1-min 90 --faith-min 0.85 --out reports/eval_gate_v3_dev_r3.json

# v4 gate: aggregation/superlative/join/3-hop/unanswerable families included
gate-v4:
	$(PYCPU) ahrag_tpu.cli.eval_gate --dataset local --data samples/synth_v4_dev.jsonl --limit 138 --f1-min 90 --faith-min 0.85 --out reports/eval_gate_v4_dev_r3.json

trajectories:
	$(PY) -m ahrag_tpu.cli.collect_trajectories --data samples/mini_questions.jsonl --limit 5

bc: trajectories
	$(PY) -m ahrag_tpu.cli.train_bc

ppo:
	$(PY) -m ahrag_tpu.cli.train_ppo --data samples/mini_questions.jsonl --episodes 5

ppo-device:
	$(PY) -m ahrag_tpu.cli.train_ppo --data samples/mini_questions.jsonl --device --updates 10

eval-rl:
	$(PY) -m ahrag_tpu.cli.eval_rl_policy --data samples/mini_questions.jsonl

snapshot:
	$(PY) -m ahrag_tpu.cli.build_rl_snapshot --data samples/mini_questions.jsonl

report:
	$(PYCPU) ahrag_tpu.cli.demo samples/mini_films.txt --no-repl --artifacts /tmp/ahrag_report_a --graph /tmp/ahrag_report_g
	$(PYCPU) ahrag_tpu.cli.benchmark --dataset local --data samples/mini_questions.jsonl --system both --limit 5 --graph /tmp/ahrag_report_g --judge-sample 0.0 --out reports/benchmark_local_r1.json
	$(PYCPU) ahrag_tpu.cli.benchmark --dataset local --data samples/mini_hotpot.jsonl --system ah_rag --limit 6 --judge-sample 0.0 --out reports/benchmark_hotpot_r1.json

serve:
	$(PY) -m ahrag_tpu.cli.serve --graph graph
