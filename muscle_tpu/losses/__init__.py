from muscle_tpu.losses.classification import (
    focal_loss,
    lsep_loss,
    soft_margin_loss,
    er_topk_loss,
)
from muscle_tpu.losses.contrastive import image_level_contrast, info_nce, pixpro_loss
from muscle_tpu.losses.emd import (
    sinkhorn_emd,
    pairwise_cosine_cost,
    crop_weight_vector,
    dynamic_matching_emd,
    static_matching_emd,
)
from muscle_tpu.losses.beacon import FieldLossConfig, field_loss
from muscle_tpu.losses.edge_support import (
    box_filter,
    grayscale_edge,
    unit_vectors,
    field_masks,
    straight_through_argmax,
)
