from .base import (
    MODEL_REGISTRY,
    ModelBundle,
    build_model,
    model_data_needs,
    model_shard_needs,
    register_model,
)

# import model modules for registration side-effects
from . import mf  # noqa: F401
from . import lightgcn  # noqa: F401
from . import sgl  # noqa: F401
from . import hccf  # noqa: F401
from . import dhcf  # noqa: F401
from . import sht  # noqa: F401
from . import hgcn  # noqa: F401
from . import hd_family  # noqa: F401
from . import kgat  # noqa: F401
from . import khgrec  # noqa: F401  (also registers HGNN, HD2, HGNNAblation)
from . import hccf_diffusion  # noqa: F401
from . import dhcf_diffusion  # noqa: F401
from . import autocf  # noqa: F401  (also registers LRMRec)
from . import sasrec  # noqa: F401  (also registers CL4SRec)
from . import ssl_family  # noqa: F401  (DirectAU/SimGCL/XSimGCL/NCL/MixGCF/SSL4Rec)
from . import social_models  # noqa: F401  (MHCN/SEPT)
from . import kgin_kgcl  # noqa: F401
from . import ktup_ripplenet  # noqa: F401  (KTUP/HKGRippleNet)

__all__ = [
    "MODEL_REGISTRY", "ModelBundle", "build_model", "model_data_needs", "model_shard_needs",
    "register_model",
]
