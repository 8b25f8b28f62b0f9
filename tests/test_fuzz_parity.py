"""Fuzz parity: random graphs x random action sequences, host gym vs device env.

The single strongest correctness claim in this framework is that the vectorized
device environment reproduces the host environment exactly (same observations,
rewards, termination). The targeted tests pin specific scenarios; this fuzz
harness hardens the claim across randomized graph topologies and trajectories.
"""
import random

import jax.numpy as jnp
import numpy as np
import pytest

from ahrag_tpu.agent import vec_env
from ahrag_tpu.agent.gym import AHRAGGymEnv
from ahrag_tpu.graph import HierarchicalGraph
from ahrag_tpu.graph.search import SearchWeights
from tests.helpers import oracle_search


def random_graph(seed: int) -> HierarchicalGraph:
    rng = random.Random(seed)
    hg = HierarchicalGraph(encoder_name="hashed")
    n_topics = rng.randint(1, 4)
    n_entities = rng.randint(3, 14)
    words = ["quantum", "jazz", "volcano", "cinema", "reef", "satellite", "museum",
             "harvest", "glacier", "circuit", "ballad", "meadow"]
    names = []
    for i in range(n_entities):
        name = f"{rng.choice(words).title()} Entity{i}"
        desc = " ".join(rng.choices(words, k=rng.randint(3, 8))) + f" item {i}"
        hg.add_entity(name, desc, rng.choice(["person", "work", "concept"]))
        names.append(name)
    for t in range(n_topics):
        members = rng.sample(names, k=rng.randint(1, len(names)))
        hg.add_summary(t, f"Topic {rng.choice(words)} {t}",
                       " ".join(rng.choices(words, k=6)),
                       confidence=rng.uniform(1, 10), members=members)
        if rng.random() < 0.5:
            hg.nodes[f"sum:{t}"]["judge_scores"] = {"overall": rng.uniform(1, 10)}
        for m in members:
            hg.add_belongs_to(hg.find_entity(m), f"sum:{t}",
                              prob=rng.uniform(0.1, 1.0))
    for a in range(n_topics):
        for b in range(a + 1, n_topics):
            if rng.random() < 0.4:
                hg.add_related(f"sum:{a}", f"sum:{b}", weight=rng.uniform(0.1, 1.0))
    if n_topics >= 2 and rng.random() < 0.6:
        hg.add_summary(n_topics, "Root community", "community of topics",
                       confidence=7.0,
                       members=[f"sum:{t}" for t in range(n_topics)], level=2)
        for t in range(n_topics):
            hg.add_belongs_to(f"sum:{t}", f"sum:{n_topics}", prob=1.0)
    for i in range(rng.randint(0, 5)):
        parts = rng.sample(names, k=min(len(names), rng.randint(1, 3)))
        h = hg.add_hyperedge(f"h{i}", f"fact about {' and '.join(parts)}",
                             "CoOccurrence", confidence_score=rng.uniform(1, 10))
        for p in parts:
            hg.add_participation(hg.find_entity(p), h)
    hg.build_vector_index(layers=(0, 1, 2))
    return hg


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_env_trajectory_parity(seed):
    rng = random.Random(1000 + seed)
    hg = random_graph(seed)
    gt = hg.tensors()
    query = " ".join(rng.choices(["quantum", "jazz", "cinema", "entity", "topic"],
                                 k=3))
    q = jnp.asarray(hg.encode_query([query])[0])
    w = SearchWeights.create()

    gym = AHRAGGymEnv(hg=hg, max_steps=6)
    hvec, _ = gym.reset(query)
    dstate = vec_env.env_reset(gt, q, w)
    np.testing.assert_allclose(hvec, np.asarray(vec_env.observe(gt, dstate)),
                               atol=2e-3, err_msg=f"seed {seed} reset")

    for step in range(6):
        a = rng.randrange(5)  # actions 0..4 (end tested separately)
        hvec, hr, hdone, _ = gym.step(a)
        dstate, dr, ddone = vec_env.env_step(gt, dstate, jnp.int32(a))
        assert abs(float(dr) - hr) < 1e-5, (seed, step, a, float(dr), hr)
        assert bool(ddone) == hdone, (seed, step, a)
        np.testing.assert_allclose(hvec, np.asarray(vec_env.observe(gt, dstate)),
                                   atol=2e-3, err_msg=f"seed {seed} step {step} a {a}")
        if hdone:
            break


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_search_oracle_parity(seed):
    rng = random.Random(2000 + seed)
    hg = random_graph(seed + 50)
    for _ in range(3):
        query = " ".join(rng.choices(["quantum", "jazz", "volcano", "museum",
                                      "entity", "glacier"], k=rng.randint(1, 4)))
        ours = hg.search(query, top_k=5)
        ref = oracle_search(hg, query, top_k=5)
        assert [r["node_id"] for r in ours] == [r["node_id"] for r in ref], \
            (seed, query)
