"""Sharded (multi-chip) encode paths on the 8-virtual-device CPU mesh:
results must match the single-device encoder exactly; ragged batches pad."""

import numpy as np
import pytest

import jax

from clip_lora_match_tpu.parallel import make_mesh
from clip_lora_match_tpu.parallel.sharded_encode import (
    ShardedEncoder,
    sharded_text_encode_fn,
)
from tests.test_index_retrieval import TINY, tiny_encoder  # noqa: F401


def test_mesh_shape():
    mesh = make_mesh()
    assert mesh.devices.size == jax.device_count()
    assert mesh.axis_names == ("data", "model")
    m2 = make_mesh(n_data=4)
    assert m2.devices.size == 4


def test_sharded_text_encode_matches_single(tiny_encoder):  # noqa: F811
    texts = [f"tas warna {i} ditemukan di gedung {i}" for i in range(13)]  # ragged
    enc = tiny_encoder.preprocessor.preprocess_text(texts)
    single = tiny_encoder.encode_text_batch(enc["input_ids"], enc["attention_mask"])
    sh = ShardedEncoder(
        tiny_encoder.params, TINY, eot_id=tiny_encoder.eot_id
    )
    assert sh.n_devices == 8
    multi = sh.encode_text_batch(enc["input_ids"], enc["attention_mask"])
    assert multi.shape == (13, TINY.projection_dim)
    np.testing.assert_allclose(multi, single, atol=1e-5)


def test_sharded_image_encode_matches_single(tiny_encoder):  # noqa: F811
    rng = np.random.default_rng(0)
    pix = rng.normal(size=(11, TINY.image_size, TINY.image_size, 3)).astype(
        np.float32
    )
    single = tiny_encoder.encode_image_batch(pix)
    sh = ShardedEncoder(tiny_encoder.params, TINY, eot_id=tiny_encoder.eot_id)
    multi = sh.encode_image_batch(pix)
    np.testing.assert_allclose(multi, single, atol=1e-5)


def test_sharded_index_build(tiny_encoder, reference_root):  # noqa: F811
    """Full sharded index build over the mesh via the encode_fn hook."""
    import os

    from clip_lora_match_tpu.index import build_index_from_csv, verify_index
    from clip_lora_match_tpu.retrieval import SearchIndex

    fn = sharded_text_encode_fn(tiny_encoder)
    index = build_index_from_csv(
        os.path.join(reference_root, "data/custom/my_items.csv"),
        tiny_encoder,
        custom_format=True,
        encode_fn=fn,
    )
    assert len(index) == 3 and verify_index(index)
    res = SearchIndex(index, tiny_encoder).search_by_text(index.texts[1], k=1)
    assert res[0].index == 1


def test_empty_batches(tiny_encoder):  # noqa: F811
    sh = ShardedEncoder(tiny_encoder.params, TINY, eot_id=tiny_encoder.eot_id)
    assert sh.encode_text_batch(np.zeros((0, 77), np.int32)).shape == (0, 16)
    assert sh.encode_image_batch(
        np.zeros((0, TINY.image_size, TINY.image_size, 3), np.float32)
    ).shape == (0, 16)


def test_package_import_does_not_initialize_backend():
    """Importing the parallel package must not touch the XLA backend:
    multi-host workers import it BEFORE jax.distributed.initialize, which
    hard-fails if anything module-level created a device array (regression:
    ops/ring_attention.py's mask floor was once a jnp scalar)."""
    import subprocess
    import sys

    code = (
        "import sys\n"
        "sys.path.insert(0, '.')\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "import clip_lora_match_tpu.parallel\n"
        "import clip_lora_match_tpu.train\n"
        "import clip_lora_match_tpu.models.clip\n"
        "from jax._src import xla_bridge\n"
        "assert not xla_bridge._backends, xla_bridge._backends\n"
        "print('clean')\n"
    )
    env = {"PYTHONPATH": "", "PALLAS_AXON_POOL_IPS": "", "PATH": "/usr/bin:/bin",
           "JAX_PLATFORMS": "cpu", "HOME": "/tmp"}
    res = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=120, env=env, cwd="/root/repo",
    )
    assert res.returncode == 0 and "clean" in res.stdout, (
        res.stdout + res.stderr
    )
