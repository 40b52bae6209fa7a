"""DataFrame-level libraries behind the registry queries.

- `similarity`: deterministic sign-random-projection LSH primitives
  (the exact scaled-int machinery the oracle queries replay in SQL).
- `ann`: user-facing cosine top-k (exact broadcast and LSH-bucketed).
- `dedup`: minhash signatures, LSH candidate pairs, near-dup
  components over any corpus DataFrame.
- `graph`: connected components (min-label propagation and
  large-star/small-star).
- `kmeans`: full iterative Lloyd fit (map-only assignment against
  literal centroids, k·dim-bounded update shuffle) for IVF builds
  and semantic clustering.
- `multimodal`: binary-column decode/feature stages (mapInPandas).
- `curation`: decontamination n-gram overlap, sequence packing,
  regex pattern scan, temperature mixture weights.
"""

from polars_readstat_spark.functions.ann import (  # noqa: F401
    cosine_topk,
    cosine_topk_ivf,
    cosine_topk_lsh,
    ivf_build,
)
from polars_readstat_spark.functions.curation import (  # noqa: F401
    mixture_weights,
    ngram_overlap,
    pack_sequences,
    pattern_scan,
    word_ngrams,
)
from polars_readstat_spark.functions.dedup import (  # noqa: F401
    lsh_bands,
    lsh_candidate_pairs,
    near_dup_components,
    recommended_simhash,
    shingle_minhash,
    simhash_bits,
    simhash_candidate_pairs,
)
from polars_readstat_spark.functions.graph import (  # noqa: F401
    connected_components,
    connected_components_star,
)
from polars_readstat_spark.functions.kmeans import (  # noqa: F401
    assign_clusters,
    kmeans_fit,
)
