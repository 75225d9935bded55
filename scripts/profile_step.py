"""Per-op time breakdown of the attribution step (xprof trace -> table).

Captures one jax.profiler trace of the bench-config attribution step on the
real TPU and aggregates device-plane op durations, so the MFU gap is
attributable to specific fusions/kernels instead of guessed at
(the coarse-grained companion is scripts/bench_ablate.py).

Usage: python scripts/profile_step.py [batch] [seq] [top_n]
"""

import collections
import glob
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def capture(step, args, tmpdir):
    step(*args)  # compile outside the trace
    with jax.profiler.trace(tmpdir):
        out = step(*args)
        jax.block_until_ready(out)


def device_op_times(tmpdir):
    """Aggregate XLA-op durations from the device planes of the newest
    xplane capture under ``tmpdir``."""
    from jax.profiler import ProfileData

    paths = sorted(glob.glob(os.path.join(tmpdir, "**", "*.xplane.pb"),
                             recursive=True))
    if not paths:
        raise RuntimeError(f"no xplane capture under {tmpdir}")
    data = ProfileData.from_file(paths[-1])
    per_op = collections.Counter()
    total = 0
    for plane in data.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        for line in plane.lines:
            # leaf-level kernel timeline only — module/while lines would
            # double-count their children
            if line.name != "XLA Ops":
                continue
            for event in line.events:
                dur = event.duration_ns
                # strip the HLO operand dump: '%name = type(args)...' -> name
                name = event.name.split(" = ")[0].lstrip("%")
                if name.startswith(("while", "conditional")):
                    # control-flow parents span their children on the same
                    # timeline — counting them double-counts the body
                    continue
                per_op[name] += dur
                total += dur
    return per_op, total


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 25

    import lxt_tpu
    from lxt_tpu.attribution import input_relevance, select_logit
    from lxt_tpu.models import common as jcommon
    from lxt_tpu.models import llama as jllama

    # mirror bench.py's step exactly (unrolled driver + static flash opts)
    attn_impl = os.environ.get("LXT_PROF_ATTN", "auto+split")

    cfg = jllama.LlamaConfig(
        vocab_size=32000, hidden_size=2048, intermediate_size=5632,
        num_layers=22, num_heads=32, num_kv_heads=4, rms_eps=1e-5,
        dtype="bfloat16")
    params = jllama.init_params(cfg, jax.random.PRNGKey(0))
    ids = jax.random.randint(jax.random.PRNGKey(1), (B, T), 0, cfg.vocab_size)
    embeds = jllama.embed(params, ids)

    @jax.jit
    def step(params, e):
        def target(x):
            return select_logit(jllama.forward(
                params, cfg, x, lxt_tpu.attnlrp, remat=False,
                attn_impl=attn_impl, layer_driver=jcommon.unrolled,
                logits_at=-1).logits)
        return input_relevance(target, e)

    tmpdir = tempfile.mkdtemp(prefix="lxt_prof_")
    capture(step, (params, embeds), tmpdir)
    per_op, total = device_op_times(tmpdir)
    print(f"device total: {total / 1e6:.2f} ms across {len(per_op)} ops")
    for name, dur in per_op.most_common(top_n):
        print(f"{dur / 1e6:9.3f} ms  {100 * dur / max(total, 1):5.1f}%  {name}")
    # aggregate by op family (strip trailing .N / _N instance suffixes) so
    # the 22-layer repetition reads as one line per op kind
    fam = collections.Counter()
    counts = collections.Counter()
    for name, dur in per_op.items():
        base = name.rstrip("0123456789").rstrip("._-")
        fam[base] += dur
        counts[base] += 1
    print("\nby op family:")
    for name, dur in fam.most_common(top_n):
        print(f"{dur / 1e6:9.3f} ms  {100 * dur / max(total, 1):5.1f}%  "
              f"x{counts[name]:<4d} {name}")


if __name__ == "__main__":
    main()
