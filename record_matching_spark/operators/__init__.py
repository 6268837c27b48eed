from record_matching_spark.operators.normalize import normalize_files, tokenize  # noqa: F401
from record_matching_spark.operators.minhash import with_minhash_signature  # noqa: F401
from record_matching_spark.operators.blocking import (  # noqa: F401
    blocking_keys,
    candidate_pairs,
)
from record_matching_spark.operators.scoring import (  # noqa: F401
    pair_features,
    score_pairs,
    train_random_forest_cv,
    train_weights,
)
from record_matching_spark.operators.refine import (  # noqa: F401
    cluster_coherence,
    refine_clusters,
)
from record_matching_spark.operators.cluster import connected_components  # noqa: F401
from record_matching_spark.operators.evaluate import pairwise_metrics, adjusted_rand_index  # noqa: F401
