"""Score attribution faithfulness with perturbation curves (MoRF/LeRF/ABPC).

The AttnLRP paper's evaluation protocol, which the torch reference does not
ship: flip the most-relevant tokens first and watch the explained logit
collapse, flip the least-relevant first and watch it survive; the area
between the curves (ABPC) is the faithfulness score. Here the whole sweep —
ranking, masking, steps+1 forwards, three orderings — is one jitted XLA
program per composite, so *measuring* which rule set is most faithful costs
seconds instead of eyeballing heatmaps.

Run on random weights (structure demo), or point it at a real checkpoint:

    python examples/faithfulness_eval.py [/path/to/hf_checkpoint]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import lxt_tpu
from lxt_tpu.attribution import input_relevance
from lxt_tpu.models import llama as jllama
from lxt_tpu.utils.faithfulness import faithfulness_report


def main():
    if len(sys.argv) > 1:
        model = lxt_tpu.from_pretrained(sys.argv[1])
        cfg, params = model.cfg, model.params
    else:
        cfg = jllama.LlamaConfig(vocab_size=256, hidden_size=128,
                                 intermediate_size=256, num_layers=4,
                                 num_heads=4, num_kv_heads=4)
        params = jllama.init_params(cfg, jax.random.PRNGKey(0))

    B, T = 4, 64
    ids = jax.random.randint(jax.random.PRNGKey(1), (B, T), 0, cfg.vocab_size)
    embeds = jllama.embed(params, ids)

    composites = {"attnlrp": lxt_tpu.attnlrp, "cp_lrp": lxt_tpu.cp_lrp,
                  "vanilla_gradient": lxt_tpu.vanilla_gradient}

    # one shared explained token per example: the model's argmax at the last
    # position (so every composite is scored on the SAME target)
    def last_row(x):
        return jllama.forward(params, cfg, x, lxt_tpu.attnlrp,
                              logits_at=-1).logits[:, 0, :]

    tok = jnp.argmax(jax.jit(last_row)(embeds), -1)

    def target(x):
        return jnp.take_along_axis(last_row(x), tok[:, None], -1)[:, 0]

    print(f"{'composite':>18} {'auc_morf':>9} {'auc_lerf':>9} "
          f"{'auc_rand':>9} {'ABPC':>7}")
    for name, comp in composites.items():
        def tgt(x, comp=comp):
            logits = jllama.forward(params, cfg, x, comp,
                                    logits_at=-1).logits[:, 0, :]
            return jnp.take_along_axis(logits, tok[:, None], -1)[:, 0]

        @jax.jit
        def run(x):
            _, rel = input_relevance(lambda xx: tgt(xx).sum(), x)
            # curves are evaluated under the PLAIN model (vanilla forward ==
            # every composite's forward; rules only change the backward)
            rep = faithfulness_report(target, x, rel, steps=16,
                                      key=jax.random.PRNGKey(2))
            return {k: rep[k] for k in ("auc_morf", "auc_lerf",
                                        "auc_random", "abpc")}

        rep = run(embeds)
        print(f"{name:>18} {float(rep['auc_morf'].mean()):9.4f} "
              f"{float(rep['auc_lerf'].mean()):9.4f} "
              f"{float(rep['auc_random'].mean()):9.4f} "
              f"{float(rep['abpc'].mean()):7.4f}")

    # gradient-method baselines (the methods the AttnLRP paper beats):
    # IG needs `steps` backwards per map, SmoothGrad `samples` — vs ONE for
    # the LRP composites above
    from lxt_tpu.baselines import integrated_gradients, smoothgrad

    baselines = {
        "integrated_grads": lambda x: integrated_gradients(target, x,
                                                           steps=16),
        "smoothgrad": lambda x: smoothgrad(target, x,
                                           jax.random.PRNGKey(3),
                                           samples=16, sigma=0.1),
    }
    for name, attr_fn in baselines.items():
        @jax.jit
        def run(x, attr_fn=attr_fn):
            rep = faithfulness_report(target, x, attr_fn(x), steps=16,
                                      key=jax.random.PRNGKey(2))
            return {k: rep[k] for k in ("auc_morf", "auc_lerf",
                                        "auc_random", "abpc")}

        rep = run(embeds)
        print(f"{name:>18} {float(rep['auc_morf'].mean()):9.4f} "
              f"{float(rep['auc_lerf'].mean()):9.4f} "
              f"{float(rep['auc_random'].mean()):9.4f} "
              f"{float(rep['abpc'].mean()):7.4f}")


if __name__ == "__main__":
    main()
