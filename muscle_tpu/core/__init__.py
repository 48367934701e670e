from muscle_tpu.core.cam_norm import (
    cam_maxnorm,
    cam_maxnorm_with_bg,
    cam_softmaxnorm,
    attach_bg_channel,
    gap2d,
    gap2d_pos,
)
from muscle_tpu.core.resize import resize_bilinear, resize_to
from muscle_tpu.core.sobel import sobel_kernel, sobel_edges, orient_quantize
from muscle_tpu.core.palette import voc_color_map
