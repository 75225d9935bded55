"""BERT sequence-classification attribution (reference quickstart BERT flow):
which prompt tokens drive the predicted class?"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import jax
import numpy as np

import lxt_tpu
from lxt_tpu.attribution import normalize_relevance


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default=None,
                    help="local BertForSequenceClassification checkpoint dir")
    args = ap.parse_args()

    if args.model:
        from transformers import AutoModelForSequenceClassification, AutoTokenizer
        tok = AutoTokenizer.from_pretrained(args.model)
        model = lxt_tpu.from_hf(
            AutoModelForSequenceClassification.from_pretrained(args.model))
        enc = tok("A truly delightful movie with a heartfelt story.")
        ids = np.asarray(enc["input_ids"])[None]
        words = tok.convert_ids_to_tokens(ids[0])
    else:
        from lxt_tpu.models import bert as jbert
        from lxt_tpu.models.registry import AttributionModel, _family_table
        cfg = jbert.BertConfig(vocab_size=512, hidden_size=128,
                               intermediate_size=256, num_layers=4,
                               num_heads=4, num_labels=2)
        params = jbert.init_params(cfg, jax.random.PRNGKey(0))
        model = AttributionModel("bert", cfg, params, lxt_tpu.attnlrp,
                                 _family_table()["bert"])
        ids = np.random.RandomState(0).randint(0, 512, (1, 10))
        words = [f"tok{i}" for i in ids[0]]

    logits = np.asarray(model.logits(ids))
    pred = int(logits.argmax(-1)[0])
    value, rel = model.attribute(ids)
    heat = np.asarray(normalize_relevance(rel[0]))
    print(f"predicted class {pred}, logit {float(value):+.4f}")
    for w, r in zip(words, heat):
        print(f"  {w:>12s} {r:+.3f} {'#' * int(abs(r) * 30)}")


if __name__ == "__main__":
    main()
