from ahrag_tpu.graph.host import HierarchicalGraph
from ahrag_tpu.graph.search import (SearchResult, SearchWeights, hybrid_search,
                                    hybrid_search_batch)
from ahrag_tpu.graph.tensors import GraphTensors, build_graph_tensors
