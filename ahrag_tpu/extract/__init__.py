from ahrag_tpu.extract.chunking import smart_chunks
from ahrag_tpu.extract.extractor import HypergraphExtractor
