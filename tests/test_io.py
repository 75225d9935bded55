"""Native safetensors loader vs the reference safetensors library."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def st_file(tmp_path_factory):
    import ml_dtypes
    from safetensors.numpy import save_file

    rng = np.random.RandomState(0)
    tensors = {
        "a_f32": rng.randn(17, 33).astype(np.float32),
        "b_bf16": rng.randn(64, 64).astype(ml_dtypes.bfloat16),
        "c_f16": rng.randn(8, 4, 2).astype(np.float16),
        "d_i8": rng.randint(-100, 100, (5, 5)).astype(np.int8),
    }
    path = tmp_path_factory.mktemp("ckpt") / "model.safetensors"
    save_file(tensors, str(path))
    return path, tensors


def test_native_loader_matches(st_file):
    from lxt_tpu.io import load_safetensors

    path, tensors = st_file
    loaded = load_safetensors(path)
    assert set(loaded) == set(tensors)
    np.testing.assert_array_equal(loaded["a_f32"], tensors["a_f32"])
    np.testing.assert_array_equal(loaded["d_i8"], tensors["d_i8"])
    np.testing.assert_allclose(
        loaded["b_bf16"], tensors["b_bf16"].astype(np.float32), rtol=0, atol=0)
    np.testing.assert_allclose(
        loaded["c_f16"], tensors["c_f16"].astype(np.float32), rtol=0, atol=0)


def test_checkpoint_dir_multi_shard(tmp_path):
    import json

    from safetensors.numpy import save_file

    from lxt_tpu.io import load_checkpoint_state_dict

    rng = np.random.RandomState(1)
    t1 = {"x": rng.randn(4, 4).astype(np.float32)}
    t2 = {"y": rng.randn(2, 8).astype(np.float32)}
    save_file(t1, str(tmp_path / "model-00001-of-00002.safetensors"))
    save_file(t2, str(tmp_path / "model-00002-of-00002.safetensors"))
    (tmp_path / "model.safetensors.index.json").write_text(json.dumps({
        "weight_map": {"x": "model-00001-of-00002.safetensors",
                       "y": "model-00002-of-00002.safetensors"}}))

    state = load_checkpoint_state_dict(tmp_path)
    np.testing.assert_array_equal(state["x"], t1["x"])
    np.testing.assert_array_equal(state["y"], t2["y"])


def test_end_to_end_params_from_checkpoint(tmp_path):
    """HF llama checkpoint dir -> converted pytree -> forward parity with the
    torch-state_dict conversion path."""
    import jax.numpy as jnp
    import torch
    from safetensors.torch import save_file as save_torch
    from transformers.models.llama.modeling_llama import LlamaConfig, LlamaForCausalLM

    import lxt_tpu
    from lxt_tpu.io import load_checkpoint_params
    from lxt_tpu.models import llama as jllama

    torch.manual_seed(0)
    hf = LlamaForCausalLM(LlamaConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, vocab_size=256,
        max_position_embeddings=64)).eval()
    sd = {k: v.contiguous() for k, v in hf.state_dict().items()}
    save_torch(sd, str(tmp_path / "model.safetensors"))

    cfg = jllama.LlamaConfig.from_hf(hf.config)
    params_native = load_checkpoint_params(tmp_path, cfg, jllama.params_from_hf)
    params_torch = jllama.params_from_hf(hf.state_dict(), cfg)

    ids = jnp.arange(8)[None]
    e1 = jllama.embed(params_native, ids)
    e2 = jllama.embed(params_torch, ids)
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2), atol=0)

    l1 = jllama.forward(params_native, cfg, e1, lxt_tpu.attnlrp).logits
    l2 = jllama.forward(params_torch, cfg, e2, lxt_tpu.attnlrp).logits
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=0, atol=1e-6)


def test_numpy_fallback_matches_native(st_file):
    """The pure-numpy reader (used when g++ is unavailable) returns exactly
    the native loader's output."""
    from lxt_tpu.io import _load_safetensors_numpy, load_safetensors

    path, _ = st_file
    native = load_safetensors(path)
    fallback = _load_safetensors_numpy(path, np.float32)
    assert set(native) == set(fallback)
    for name in native:
        np.testing.assert_array_equal(native[name], fallback[name])


def test_malformed_safetensors_raises(tmp_path):
    """Truncated/malformed containers must raise, not read out of bounds."""
    import struct

    from lxt_tpu.io import _load_safetensors_numpy, load_safetensors

    # header length pointing past end-of-file
    bad1 = tmp_path / "bad_header.safetensors"
    bad1.write_bytes(struct.pack("<Q", 1 << 40) + b"{}")
    with pytest.raises((FileNotFoundError, ValueError)):
        load_safetensors(bad1)

    # valid header, tensor data_offsets beyond the data section
    import json
    header = json.dumps({"w": {"dtype": "F32", "shape": [4, 4],
                               "data_offsets": [0, 64]}}).encode()
    bad2 = tmp_path / "truncated.safetensors"
    bad2.write_bytes(struct.pack("<Q", len(header)) + header + b"\x00" * 16)
    with pytest.raises(ValueError):
        load_safetensors(bad2)
    with pytest.raises(ValueError):
        _load_safetensors_numpy(bad2, np.float32)

    # wrong byte count for the element count
    header = json.dumps({"w": {"dtype": "F32", "shape": [4],
                               "data_offsets": [0, 12]}}).encode()
    bad3 = tmp_path / "badcount.safetensors"
    bad3.write_bytes(struct.pack("<Q", len(header)) + header + b"\x00" * 12)
    with pytest.raises(ValueError):
        load_safetensors(bad3)
