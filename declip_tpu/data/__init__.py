from declip_tpu.data.dataset import ClipDataset, ImageNetDataset  # noqa: F401
from declip_tpu.data.dataloader import ClipDataLoader, build_clip_dataloader  # noqa: F401
from declip_tpu.data.sampler import (  # noqa: F401
    DistributedEpochSampler,
    DistributedGivenIterationSampler,
    compute_total_iter,
)
from declip_tpu.data.transforms import build_common_augmentation  # noqa: F401
from declip_tpu.data.evaluator import ImageNetEvaluator, build_evaluator  # noqa: F401
