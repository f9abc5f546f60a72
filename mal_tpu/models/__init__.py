from mal_tpu.models.resnet import ResNetFeatures  # noqa: F401
from mal_tpu.models.depth_decoder import DepthDecoder  # noqa: F401
from mal_tpu.models.pose_decoder import PoseDecoder, PoseCNN  # noqa: F401
from mal_tpu.models.encoders import ResnetEncoder, ResnetEncoderMatching  # noqa: F401
from mal_tpu.models.mal_model import MALModel  # noqa: F401
