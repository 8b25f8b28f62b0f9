PY ?= python

.PHONY: test ingest bench gate trajectories bc ppo ppo-device eval-rl snapshot

test:
	$(PY) -m pytest tests/ -q

ingest:
	$(PY) -m ahrag_tpu.cli.demo samples/mini_films.txt --no-repl

bench:
	$(PY) bench.py

gate:
	$(PY) -m ahrag_tpu.cli.eval_gate --data samples/mini_questions.jsonl --limit 5

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
