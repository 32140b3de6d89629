from mvdetr_tpu.ops.decode import ctdet_decode, heatmap_peaks, mvdet_decode
from mvdetr_tpu.ops.msda import level_start_indices, ms_deform_attn, ms_deform_attn_same_shape
from mvdetr_tpu.ops.nms import distance_nms
from mvdetr_tpu.ops.sampling import bilinear_gather, bilinear_sample_batched
from mvdetr_tpu.ops.warp import invert_3x3, perspective_warp

__all__ = [
    "bilinear_gather",
    "bilinear_sample_batched",
    "ctdet_decode",
    "distance_nms",
    "heatmap_peaks",
    "invert_3x3",
    "level_start_indices",
    "ms_deform_attn",
    "ms_deform_attn_same_shape",
    "mvdet_decode",
    "perspective_warp",
]
