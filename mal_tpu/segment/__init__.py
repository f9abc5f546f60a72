from mal_tpu.segment.criterion import (CriterionConfig,  # noqa: F401
                                       set_criterion, set_criterion_deep)
from mal_tpu.segment.datasets import (CATALOGS, SegCatalog,  # noqa: F401
                                      SemSegFolderDataset,
                                      catalog_from_panoptic_json,
                                      panoptic_to_targets,
                                      semantic_to_targets)
from mal_tpu.segment.inference import (PanopticSeg,  # noqa: F401
                                       panoptic_inference,
                                       semantic_inference, semantic_tta)
from mal_tpu.segment.instances import Instances  # noqa: F401
from mal_tpu.segment.maskformer_v1 import (FPNPixelDecoder,  # noqa: F401
                                           MaskFormerV1,
                                           PerPixelBaselineHead,
                                           StandardTransformerDecoder,
                                           TransformerEncoderPixelDecoder)
from mal_tpu.segment.matcher import hungarian_match, match_instances  # noqa: F401
