"""Retrieval-knob lever (round-5 PPO unfreeze): wiring + policy learnability."""
from __future__ import annotations

import json

import numpy as np

from ahrag_tpu.agent.agent import AHRAG_Agent
from ahrag_tpu.agent.environment import GraphEnvironment
from ahrag_tpu.agent.inference import InferenceEngine
from tests.helpers import build_film_graph


def _run(hg, query, knobs):
    env = GraphEnvironment(hg=hg, log_level="off")
    return InferenceEngine(env, AHRAG_Agent(env)).run_inference(query,
                                                                knobs=knobs)


def test_knobs_change_retrieved_set():
    hg = build_film_graph()
    hg.build_vector_index(layers=(0, 1, 2))
    q = "Who directed Ed Wood?"
    wide = _run(hg, q, {"max_entities": 9, "max_summaries": 4})
    narrow = _run(hg, q, {"max_entities": 1, "max_summaries": 1, "hops": 0})
    # the caps bound what survives into EVIDENCE (what the answerer reads)
    assert (len(narrow["evidence"]["entities"])
            < len(wide["evidence"]["entities"]))
    assert (len(narrow["evidence"]["summaries"])
            < len(wide["evidence"]["summaries"]))
    # default knobs == no knobs arg (back-compat)
    default = _run(hg, q, None)
    explicit = _run(hg, q, dict(InferenceEngine.DEFAULT_KNOBS))
    assert default["retrieved_nodes"] == explicit["retrieved_nodes"]
    assert default["answer"] == explicit["answer"]


def test_knob_policy_learns_reward_matrix(tmp_path):
    """On a matrix where who-questions reward config 1 and year-questions
    config 2, the PPO-trained policy must beat the always-default rule."""
    from ahrag_tpu.agent.knob_policy import (evaluate_policy,
                                             train_knob_policy)
    rng = np.random.default_rng(0)
    names = ["Alva Rein", "Bodin Kells", "Corin Vale", "Doria Lenk"]
    items = []
    for i in range(64):
        if i % 2 == 0:
            q = f"Who worked beside {names[i % 4]}?"
            best = 1
        else:
            q = f"In what year did {names[i % 4]} move away?"
            best = 2
        f1s = [30.0] * 6
        f1s[best] = 90.0
        items.append({"id": f"it{i}", "qtype": "t", "question": q,
                      "configs": [{"config": str(c), "f1": f1s[c],
                                   "em": 0.0, "n_retrieved": 5,
                                   "retrieved_hash": "x"}
                                  for c in range(6)]})
    matrix = tmp_path / "matrix.json"
    matrix.write_text(json.dumps({"items": items}))
    ckpt = tmp_path / "kp.msgpack"
    stats = train_knob_policy(str(matrix), str(ckpt), steps=300)
    assert stats["train_policy_f1"] > stats["train_default_f1"] + 20
    ev = evaluate_policy(str(matrix), str(ckpt), n_boot=200)
    assert ev["ppo_minus_rule"] > 20
    assert ev["ci95"][0] > 0
