from mvdetr_tpu.models.deformable import DeformableEncoder, MSDeformAttn
from mvdetr_tpu.models.heads import OutputHead
from mvdetr_tpu.models.mvdetr import MVDeTr
from mvdetr_tpu.models.resnet import ResNetFeatures, load_torchvision_state_dict, resnet18_features
from mvdetr_tpu.models.transformer import TransformerEncoder
from mvdetr_tpu.models.vgg import VGG11Features, load_torchvision_vgg11_state_dict
from mvdetr_tpu.models.world_feat import build_world_feat

__all__ = [
    "DeformableEncoder",
    "MSDeformAttn",
    "MVDeTr",
    "OutputHead",
    "ResNetFeatures",
    "TransformerEncoder",
    "VGG11Features",
    "build_world_feat",
    "load_torchvision_state_dict",
    "load_torchvision_vgg11_state_dict",
    "resnet18_features",
]
