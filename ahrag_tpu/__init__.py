"""ahrag_tpu — TPU-native agentic hierarchical RAG framework.

A from-scratch JAX/XLA/Pallas implementation of the capabilities of the reference
AH-RAG system (see SURVEY.md): hypergraph knowledge extraction, multi-level semantic
aggregation (L0 entities/hyperedges -> L1 topics -> L2 communities), hybrid dense +
graph retrieval compiled to device tensors, an agentic traversal environment with
rule/LLM/RL policies, token-budgeted answer synthesis, and a retriever x generator
diagnostic evaluation framework.

Import layout:
    ahrag_tpu.utils      config / logging / llm / tokens
    ahrag_tpu.models     encoders (hashed n-gram, MiniLM-class flax) and policy nets
    ahrag_tpu.ops        Pallas/XLA kernels (fused matmul+top-k, masked top-k, k-means)
    ahrag_tpu.graph      GraphTensors, artifact compiler, hybrid search, facade
    ahrag_tpu.agent      environment, gym, featurizer, reward, inference, RL policies
    ahrag_tpu.parallel   mesh + sharded (multi-chip) search
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy top-level exports (keeps `import ahrag_tpu` free of jax init)."""
    if name == "HierarchicalGraph":
        from ahrag_tpu.graph import HierarchicalGraph
        return HierarchicalGraph
    if name == "RetrievalService":
        from ahrag_tpu.serve import RetrievalService
        return RetrievalService
    if name == "GraphEnvironment":
        from ahrag_tpu.agent.environment import GraphEnvironment
        return GraphEnvironment
    if name == "InferenceEngine":
        from ahrag_tpu.agent.inference import InferenceEngine
        return InferenceEngine
    raise AttributeError(name)
