from muscle_tpu.data.voc12 import (
    load_img_name_list,
    load_label_dict,
    load_label_from_xml,
    build_cls_labels,
    class_frequency_sample_weights,
    VOC12ClsPixDataset,
    VOC12SegDataset,
    VOC12AffinityDataset,
    VOC12ImageDataset,
    get_img_path,
)
from muscle_tpu.data.transforms import (
    color_norm,
    random_resize_long,
    random_crop,
    color_jitter,
    random_erasing,
    two_views,
)
from muscle_tpu.data.tta import msf_batch, MSF_BUCKETS
from muscle_tpu.data.loader import PrefetchLoader
