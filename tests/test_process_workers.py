"""Process-based loader workers (``worker_type: process``).

Thread workers scale the GIL-releasing legs (PIL / native decode) but
serialize the Python glue (BPE tokenize, EDA, batch assembly); on a host
feeding several chips that glue is the ceiling, so the loader can move
whole-batch building into spawned worker processes that hermetically
rebuild the dataset from the config. These tests pin the contract: batches
(images, tokens, keyed MLM/EDA draws) are BIT-IDENTICAL to the thread
loader, and resume keying (start_batch_idx) is worker-type independent.
"""

import numpy as np
import pytest

from declip_tpu.data.dataloader import ClipDataLoader, build_clip_dataloader


def _cfg(**kw):
    cfg = {
        "type": "clip",
        "read_from": "synthetic",
        "meta_file": "64",
        "batch_size": 8,
        "num_workers": 2,
        "transforms": {"type": "ONECROP"},
        "sampler": {"type": "distributed_iteration"},
        "max_iter": 3,
        "eda": True,
        "text_mask_type": "MLM",
        "seed": 3,
    }
    cfg.update(kw)
    return cfg


def _collect(loader, n=3):
    out = []
    for i, b in enumerate(loader):
        out.append(b)
        if i + 1 >= n:
            break
    return out


def test_process_workers_match_thread_workers():
    ref = _collect(build_clip_dataloader(_cfg()))
    got = _collect(build_clip_dataloader(_cfg(worker_type="process")))
    assert len(ref) == len(got) == 3
    for rb, gb in zip(ref, got):
        assert set(rb) == set(gb)
        for k in ("images", "tokens", "tokens_aug", "mlm_tokens",
                  "mlm_labels", "labels"):
            np.testing.assert_array_equal(rb[k], gb[k], err_msg=k)


def test_process_workers_resume_keying():
    """A loader resumed at last_iter=1 must replay batches 2.. of the
    from-scratch stream — including the keyed MLM mask and EDA draws."""
    full = _collect(build_clip_dataloader(_cfg()), n=3)
    resumed = _collect(
        build_clip_dataloader(_cfg(worker_type="process"), last_iter=1),
        n=1)
    for k in ("images", "tokens", "tokens_aug", "mlm_tokens", "mlm_labels"):
        np.testing.assert_array_equal(full[2][k], resumed[0][k], err_msg=k)


def test_direct_dataset_requires_thread_workers():
    with pytest.raises(ValueError, match="proc_spec"):
        ClipDataLoader(object(), sampler=None, batch_size=4,
                       worker_type="process")
    with pytest.raises(ValueError, match="worker_type"):
        ClipDataLoader(object(), sampler=None, batch_size=4,
                       worker_type="gevent")
