from .avabos import (
    AGGR_PRESENCE,
    LABEL_DICT,
    MODALITY2AGGR,
    MultimodalSource,
    clip_name,
    load_cluster_split,
    split_by_clusters,
)
from .sampler import AggrBatchSampler
from .synthetic import generate_synthetic_avabos
from .pipeline import device_prefetch
