from . import autoencoder, unet
from .autoencoder import AEConfig, init_autoencoder
from .unet import UNetConfig, init_unet, unet_apply
