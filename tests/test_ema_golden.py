"""EMA parity vs the reference implementation (prototype/utils/ema.py):
warmup-ramped decay, inner_T stride, zero-init shadow."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import ref_compat

pytestmark = pytest.mark.skipif(
    not ref_compat.available(), reason="reference tree not mounted"
)


def test_ema_matches_reference(tmp_path):
    ref_compat.install_reference(tmp_path)
    import torch
    from prototype.utils.ema import EMA as RefEMA

    from declip_tpu.train.ema import EmaConfig, ema_step, init_ema

    model = torch.nn.Linear(4, 3)
    cfg_kwargs = dict(decay=0.9, warmup=5, inner_T=2)
    ref = RefEMA(model, **cfg_kwargs)

    cfg = EmaConfig(decay=0.9, warmup=5, inner_T=2)
    params = {k: jnp.asarray(v.detach().numpy())
              for k, v in model.state_dict().items()}
    ema = init_ema(params, cfg)

    rng = np.random.default_rng(0)
    for step in range(1, 9):
        # mutate the model like an optimizer step would
        with torch.no_grad():
            for p in model.parameters():
                p.add_(torch.tensor(
                    rng.normal(0, 0.1, size=p.shape).astype(np.float32)))
        ref.step(model, curr_step=step)
        params = {k: jnp.asarray(v.detach().numpy())
                  for k, v in model.state_dict().items()}
        ema = ema_step(ema, params, jnp.asarray(step), cfg)

    for k, v in ref.ema_state_dict.items():
        np.testing.assert_allclose(
            np.asarray(ema[k]), v.numpy(), rtol=1e-5, atol=1e-7, err_msg=k)
