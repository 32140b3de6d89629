from mvdetr_tpu.data.adapters import MultiviewXScene, WildtrackScene, open_scene
from mvdetr_tpu.data.augment import random_affine, random_affine_matrix, warp_bboxes
from mvdetr_tpu.data.dataset import FrameDataset, collate
from mvdetr_tpu.data.source import FrameAnnotation, SyntheticScene
from mvdetr_tpu.data.targets import build_targets, gaussian2d, splat_gaussian

__all__ = [
    "FrameAnnotation",
    "FrameDataset",
    "MultiviewXScene",
    "SyntheticScene",
    "WildtrackScene",
    "build_targets",
    "collate",
    "gaussian2d",
    "open_scene",
    "random_affine",
    "random_affine_matrix",
    "splat_gaussian",
    "warp_bboxes",
]
