"""Flax model zoo: encoders, decoder, VAEs, classifier.

TPU-native counterparts of the reference model zoo
(/root/reference/shot_vae_model, smooth_vae_model, classifier_model):
NHWC layout, bfloat16 compute with float32 params and BatchNorm stats,
explicit PRNG collections ('sample', 'dropout') instead of global RNG state.
"""

from shotvae_tpu.models.classifier import MLPClassifier, WideResNetClassifier, build_classifier
from shotvae_tpu.models.decoder import Decoder
from shotvae_tpu.models.densenet import DenseNet, densenet_dict
from shotvae_tpu.models.preactresnet import PreActResNet, preactresnet_dict
from shotvae_tpu.models.smooth_vae import SmoothVAE, mnist_vae_config, svhn_vae_config
from shotvae_tpu.models.vae import VariationalAutoEncoder, build_encoder
from shotvae_tpu.models.wideresnet import WideResNet

__all__ = [
    "Decoder",
    "DenseNet",
    "PreActResNet",
    "SmoothVAE",
    "VariationalAutoEncoder",
    "WideResNet",
    "MLPClassifier",
    "WideResNetClassifier",
    "build_classifier",
    "build_encoder",
    "densenet_dict",
    "mnist_vae_config",
    "preactresnet_dict",
    "svhn_vae_config",
]
