"""Large-scale training-data pipeline operations over the document /
embedding tables: text analysis, deduplication, similarity search,
multimodal column stages. All are vectorized ``map_batches`` transforms
(actor pools where state is held)."""
