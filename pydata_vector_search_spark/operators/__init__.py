"""Engine operators: vector search, dedup, upsert, ANN index, multimodal."""
