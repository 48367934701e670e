from muscle_tpu.ops.random_walk import (
    PathIndex,
    edge_to_affinity,
    affinity_to_dense,
    to_transition_matrix,
    propagate_to_edge,
    propagate_to_edge_sharded,
    propagate_to_edge_stencil,
)
from muscle_tpu.ops.crf import mean_field_crf
from muscle_tpu.ops.affinity_labels import affinity_labels_from_indices
