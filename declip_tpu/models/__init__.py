"""Model registry — `model_entry(config)` equivalent
(reference: prototype/model/__init__.py:15-21)."""

from declip_tpu.utils.registry import MODELS

# importing registers the factories
from declip_tpu.models import clip_model  # noqa: F401
from declip_tpu.models import declip_model  # noqa: F401
from declip_tpu.models import slip_model  # noqa: F401
from declip_tpu.models import filip_model  # noqa: F401
from declip_tpu.models import defilip_model  # noqa: F401
from declip_tpu.models import ssl_builders  # noqa: F401 (moco/simclr/clsa)

from declip_tpu.models.clip_model import CLIP  # noqa: F401
from declip_tpu.models.declip_model import DECLIP  # noqa: F401
from declip_tpu.models.slip_model import SLIP  # noqa: F401
from declip_tpu.models.filip_model import FILIP  # noqa: F401
from declip_tpu.models.defilip_model import DEFILIP  # noqa: F401


def model_entry(config):
    """Build a model from a `{type, kwargs}` config node."""
    return MODELS.build(config)
