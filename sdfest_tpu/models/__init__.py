"""Learned models: shape VAE and pose/shape initialization networks."""
from sdfest_tpu.models.vae import SDFVAE, SDFEncoder, SDFDecoder, create_vae_from_config  # noqa: F401
from sdfest_tpu.models.pointnet import (  # noqa: F401
    VanillaPointNet,
    IterativePointNet,
    GeneralizedIterativePointNet,
)
from sdfest_tpu.models.pose_net import (  # noqa: F401
    SDFPoseHead,
    SDFPoseNet,
    create_pose_net,
)
