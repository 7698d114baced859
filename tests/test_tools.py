"""Tool CLI end-to-end drives: inference, convert (both directions),
text_visualize, linear probe."""

import json
import os
import shutil

import numpy as np
import pytest
from PIL import Image

CONFIG_SRC = os.path.join(
    os.path.dirname(__file__), "..", "experiments", "unit", "tiny_clip",
    "config.yaml",
)


@pytest.fixture
def exp(tmp_path):
    shutil.copy(CONFIG_SRC, tmp_path / "config.yaml")
    return tmp_path


def test_inference_tool(exp, tmp_path):
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        Image.fromarray(
            rng.integers(0, 255, (256, 256, 3), np.uint8)
        ).save(img_dir / f"img{i}.jpg")

    from declip_tpu.tools.inference import main

    out = tmp_path / "results.jsonl"
    main(["--config", str(exp / "config.yaml"), "--image_dir", str(img_dir),
          "--classes", "cat,dog,car", "--out", str(out)])
    lines = [json.loads(l) for l in out.read_text().splitlines()]
    assert len(lines) == 3
    assert lines[0]["prediction"] in ("cat", "dog", "car")
    assert abs(sum(lines[0]["probs"].values()) - 1.0) < 1e-3


def test_convert_tool_roundtrip(exp, tmp_path):
    """our ckpt -> .pth.tar -> our variables: params must survive."""
    from declip_tpu.config import override, parse_config
    from declip_tpu.solver import Solver
    from declip_tpu.checkpoint import save_checkpoint
    from declip_tpu.tools.convert import main

    cfg = parse_config(str(exp / "config.yaml"))
    cfg = override(cfg, "data.test", [])
    cfg["_config_path"] = str(exp / "config.yaml")
    solver = Solver(cfg)
    path = save_checkpoint(str(exp / "checkpoints"), solver.state,
                           save_many=True)

    pth = str(tmp_path / "export.pth.tar")
    main(["--to_pth", path, "--config", str(exp / "config.yaml"),
          "--out", pth])
    assert os.path.exists(pth)

    back = str(tmp_path / "back.msgpack")
    main(["--from_pth", pth, "--config", str(exp / "config.yaml"),
          "--out", back])

    import flax.serialization as ser
    import jax

    with open(back, "rb") as f:
        variables = ser.msgpack_restore(f.read())
    orig = jax.device_get(solver.state.params)
    conv = variables["params"]
    for (ka, va), (kb, vb) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(orig), key=str),
        sorted(jax.tree_util.tree_leaves_with_path(conv), key=str),
    ):
        np.testing.assert_allclose(np.asarray(va), np.asarray(vb),
                                   rtol=1e-6, err_msg=str(ka))


def test_text_visualize_tool(exp, tmp_path):
    from declip_tpu.tools.text_visualize import main

    out = tmp_path / "viz.json"
    main(["--config", str(exp / "config.yaml"),
          "--texts", "a cat,a dog,a truck", "--out", str(out)])
    data = json.loads(out.read_text())
    assert len(data["pca_2d"]) == 3
    assert len(data["cosine_similarity"]) == 3


def test_linear_probe_tool(exp, tmp_path):
    meta = tmp_path / "train.txt"
    val = tmp_path / "val.txt"
    meta.write_text("\n".join(f"x{i}.jpg {i % 3}" for i in range(24)))
    val.write_text("\n".join(f"y{i}.jpg {i % 3}" for i in range(9)))

    from declip_tpu.tools.linear_probe import main

    main(["--config", str(exp / "config.yaml"), "--meta", str(meta),
          "--val-meta", str(val), "--read-from", "synthetic", "--epochs", "2"])
