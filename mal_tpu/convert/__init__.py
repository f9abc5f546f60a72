from mal_tpu.convert.torch_weights import (  # noqa: F401
    convert_resnet_trunk,
    convert_imagenet_trunk,
    convert_depth_decoder,
    convert_pose_decoder,
    convert_pose_cnn,
    convert_matching_encoder,
    convert_mal_checkpoint_dir,
    load_pth,
)
from mal_tpu.convert.export_pth import (  # noqa: F401
    export_dynamic_checkpoint_dir,
    export_mal_checkpoint_dir,
    export_matching_encoder,
    export_resnet_trunk,
)
from mal_tpu.convert.dualref import (  # noqa: F401
    convert_depth_pose,
    convert_dualrefine_checkpoint_dir,
)
from mal_tpu.convert.mask2former import (  # noqa: F401
    convert_mask2former_pkl,
    convert_mask2former_state,
)
