from record_matching_spark.functions.text import (  # noqa: F401
    language_id,
    quality_score,
    token_count,
    token_count_bpe,
    doc_fingerprint,
    winnow_fingerprints,
    winnow_overlap_pairs,
    winnow_span_pairs,
    repetition_features,
    unigram_logprob,
    bigram_logprob,
    quality_filter,
)
from record_matching_spark.functions.dedup import (  # noqa: F401
    exact_dedup,
    exact_dup_pairs,
    ngram_jaccard_pairs,
    minhash_near_dup_pairs,
    simhash_near_dup_pairs,
    cross_corpus_near_dup_pairs,
    dedup_lines,
    ngram_decontaminate,
    near_dedup_keep_min,
    build_near_dup_index,
    near_dup_pairs_against_index,
    incremental_dedup,
)
from record_matching_spark.functions.similarity import (  # noqa: F401
    cosine_topk,
    cosine_topk_tiled,
    ivf_cosine_topk,
    ivfpq_cosine_topk,
    embedding_near_dup_pairs,
    embedding_near_dup_pairs_lsh,
    lsh_cosine_topk,
)
from record_matching_spark.functions.search import search_text  # noqa: F401
from record_matching_spark.functions.sampling import (  # noqa: F401
    hash_bucket,
    hash_split,
    quota_sample,
    pack_sequences,
    mixture_report,
    temperature_sample,
    global_shuffle_rank,
    shard_by_budget,
)
