from ahrag_tpu.baselines.naive import NaiveRAG
