"""Long-context & big-model attribution across a TPU mesh.

Three regimes, all returning relevance identical to a single big device
(tested in tests/test_parallel.py / test_ring_attention.py):

1. ring (sequence parallel): context larger than one chip's HBM — shard the
   sequence, kv slices rotate over the ICI ring.
2. sp x tp: long context AND weights too big for one chip — ring over 'sp'
   composed with tensor parallelism over 'model' (GSPMD inserts the psums).
3. pipeline parallel: layers sharded over stages, microbatches streamed
   GPipe-style; the relevance backward is the reverse pipeline from the
   same jax.vjp.

Run on a CPU host with virtual devices:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python examples/long_context_parallel.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np
from jax.sharding import Mesh

import lxt_tpu
from lxt_tpu.models import llama as jllama
from lxt_tpu.parallel import (
    attribute_pipeline_parallel,
    attribute_sequence_parallel,
    family_param_shardings,
)


def main():
    devices = jax.devices()
    n = len(devices)
    print(f"{n} devices ({jax.default_backend()})")

    cfg = jllama.LlamaConfig(
        vocab_size=512, hidden_size=128, intermediate_size=256, num_layers=4,
        num_heads=4, num_kv_heads=2, dtype="float32")
    params = jllama.init_params(cfg, jax.random.PRNGKey(0))

    # --- 1. ring: sequence sharded over all devices -------------------------
    T = 256 * n
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, T), 0, cfg.vocab_size)
    embeds = jllama.embed(params, ids)
    mesh_sp = Mesh(np.asarray(devices), ("sp",))
    value, rel = attribute_sequence_parallel(
        jllama.forward, params, cfg, embeds, mesh_sp, lxt_tpu.attnlrp)
    print(f"ring sp={n}: T={T}, value={float(value):.4f}, "
          f"relevance sharded as {rel.sharding}")

    # --- 2. sp x tp ----------------------------------------------------------
    if n % 2 == 0:
        mesh_sptp = Mesh(np.asarray(devices).reshape(n // 2, 2), ("sp", "model"))
        T2 = 256 * (n // 2)
        ids2 = jax.random.randint(jax.random.PRNGKey(2), (1, T2), 0, cfg.vocab_size)
        value, rel = attribute_sequence_parallel(
            jllama.forward, params, cfg, jllama.embed(params, ids2),
            mesh_sptp, lxt_tpu.attnlrp,
            param_shardings=family_param_shardings("llama", params, mesh_sptp))
        print(f"sp={n//2} x tp=2: T={T2}, value={float(value):.4f}")

    # --- 3. pipeline parallel ------------------------------------------------
    stages = min(4, n)
    mesh_pp = Mesh(np.asarray(devices[:stages]), ("pp",))
    ids3 = jax.random.randint(jax.random.PRNGKey(3), (4, 64), 0, cfg.vocab_size)
    value, rel = attribute_pipeline_parallel(
        jllama.forward, params, cfg, jllama.embed(params, ids3),
        mesh_pp, lxt_tpu.attnlrp, n_micro=2)
    print(f"pipeline pp={stages}: per-example values "
          f"{np.round(np.asarray(rel.sum(-1)), 3)}")


if __name__ == "__main__":
    main()
