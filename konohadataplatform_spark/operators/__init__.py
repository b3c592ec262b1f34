"""Operator namespace: dedup / similarity / retrieval / curation /
classifier / sketches / text / multimodal / fingerprint / graph / bpe /
skew / ranking / temporal. Import submodules directly for the full
surface; the most-used entry points are re-exported here."""

from konohadataplatform_spark.operators.dedup import (
    dedup_clusters,
    exact_dedup,
    jaccard_similarity_join,
    minhash_dedup,
    simhash,
)
from konohadataplatform_spark.operators.classifier import (
    perceptron_scores,
    score_with_weights,
)
from konohadataplatform_spark.operators.curation import (
    apply_group_cap,
    importance_weights,
    leakage_free_split,
    shard_plan,
    write_training_shards,
)
from konohadataplatform_spark.operators.ranking import scalable_row_number
from konohadataplatform_spark.operators.retrieval import (
    bm25_topk,
    lexical_topk,
    rrf_fuse,
)
from konohadataplatform_spark.operators.similarity import (
    ann_ivf_topk,
    ann_lsh_topk,
    centroid_outliers,
    cosine_topk,
)
from konohadataplatform_spark.operators.skew import key_skew_profile, salted_join
from konohadataplatform_spark.operators.temporal import as_of_join, range_join_buckets

__all__ = [
    "exact_dedup", "jaccard_similarity_join", "minhash_dedup", "simhash",
    "dedup_clusters", "cosine_topk", "ann_lsh_topk", "ann_ivf_topk",
    "centroid_outliers", "salted_join", "key_skew_profile",
    "scalable_row_number", "as_of_join", "range_join_buckets",
    "bm25_topk", "lexical_topk", "rrf_fuse", "perceptron_scores",
    "score_with_weights", "importance_weights", "apply_group_cap",
    "shard_plan", "write_training_shards", "leakage_free_split",
]
