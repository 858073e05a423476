#!/usr/bin/env python
"""Score EVERY golden enhanced wav the reference ships with OUR metric stack.

The reference's de-facto regression artifacts are enhanced outputs of ~17
trained checkpoints under data/subset/models (SURVEY §4.2) — including
oracle-label (``*_oracle_y``, ``*_oracle_0/1``), classifier-label
(``*_y_hat_hard``) and no-MCEM oracle-latent (``*_clean_z_nomcem_*``)
ablations. This prints one markdown table over all of them: per
(checkpoint, output-variant), the mean SI-SDR / ESTOI / native-PESQ-wb of
the enhanced speech against the shipped clean wavs — the reference's whole
experiment grid rescored by this framework's metrics layer in one command.

A handful of rows are additionally pinned as tests (tests/test_golden_metrics.py,
tests/test_pesq_native.py); this script is the full-surface version, and its
output is committed as the appendix table in PARITY.md.

Usage: python scripts/golden_metrics_table.py [--goldens DIR] [--subset DIR]
"""

import argparse
import collections
import pathlib
import re
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

from dvae_tpu.data.io import read_wav
from dvae_tpu.eval.pesq_native import pesq_wb
from dvae_tpu.eval.si_sdr import si_sdr_leroux
from dvae_tpu.eval.stoi import stoi

GOLDENS = "/root/reference/data/subset/models"
SUBSET = "/root/reference/data/subset"
UTTS = ("sa1", "sa2", "si494")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--goldens", default=GOLDENS)
    ap.add_argument("--subset", default=SUBSET)
    ap.add_argument("--ours", default=None, metavar="MATRIX_JSON",
                    help="also print OUR best-achievable subset rows beside "
                         "the rescored golden grid: reads the engine-quality "
                         "matrix written by scripts/peem_quality_study.py "
                         "(same metric stack, same 3 utterances) and appends "
                         "one row per family/label-source/engine at each "
                         "budget. CAVEAT printed with the table: golden "
                         "outputs were enhanced from ~SNR-10 mixtures not "
                         "shipped in the subset, ours from the shipped "
                         "SNR -5 mixtures — compare trends, not absolutes.")
    args = ap.parse_args()

    cleans = {}
    for utt in UTTS:
        p = pathlib.Path(args.subset) / f"processed/ntcd_timit/Clean/test/34M/{utt}.wav"
        if p.exists():
            cleans[utt] = read_wav(p)
    if not cleans:
        raise SystemExit(f"no clean subset wavs under {args.subset}")

    # rows[(model/ckpt, variant)] -> list of (si_sdr, estoi, pesq)
    rows = collections.defaultdict(list)
    utt_re = re.compile(r"^(%s)(_.*)\.wav$" % "|".join(UTTS))
    for wav in sorted(pathlib.Path(args.goldens).glob(
            "*/*/ntcd_timit/Clean/test/34M/*.wav")):
        m = utt_re.match(wav.name)
        if not m or "_n_est" in m.group(2):
            continue  # noise-estimate outputs score against noise, skip
        utt, variant = m.groups()
        if utt not in cleans:
            continue
        clean, fs = cleans[utt]
        s, _ = read_wav(wav)
        n = min(len(s), len(clean))
        ckpt = "/".join(wav.parts[len(pathlib.Path(args.goldens).parts):][:2])
        rows[(ckpt, variant)].append((
            float(si_sdr_leroux(s[:n], clean[:n])),
            float(stoi(clean[:n], s[:n], fs, extended=True)),
            float(pesq_wb(clean[:n].astype(np.float64), s[:n].astype(np.float64), fs)),
        ))

    print("| checkpoint | variant | n | SI-SDR | ESTOI | PESQ-wb (native) |")
    print("|---|---|---|---|---|---|")
    for (ckpt, variant), vals in sorted(rows.items()):
        a = np.mean(np.asarray(vals), axis=0)
        short = ckpt.replace("_nonorm_hdim_128_128_zdim_016_end_epoch_500", "")
        print(f"| {short} | {variant} | {len(vals)} "
              f"| {a[0]:.2f} | {a[1]:.3f} | {a[2]:.2f} |")

    if args.ours:
        import json

        with open(args.ours) as f:
            matrix = json.load(f)
        print("\n### Ours: best-achievable subset-trained models "
              "(same metric stack)")
        print(f"Protocol: {matrix['protocol']['sweep']}; "
              f"platform={matrix['protocol']['platform']}. CAVEAT: the "
              "golden outputs above were enhanced from ~SNR-10 mixtures "
              "(not shipped in the subset, PARITY.md section 3); these rows "
              "enhance the SHIPPED SNR -5 mixtures with subset-trained "
              "(~1k-frame) checkpoints — compare per-family trends, not "
              "absolute values against the golden rows.")
        ib = matrix.get("input_baseline")
        print("\n| family | labels | engine | niter | SI-SDR | ESTOI "
              "| PESQ-wb (native) |")
        print("|---|---|---|---|---|---|---|")
        if ib:
            print(f"| (input mixture) | — | — | — | {ib['si_sdr']:.2f} "
                  f"| {ib['estoi']:.3f} | {ib['pesq']:.2f} |")
        for c in matrix["cells"]:
            for engine in ("mcem", "peem", "peem-wf"):
                e = c.get(engine)
                if e is None:
                    continue
                print(f"| {c['family']} | {c['labels']} | {engine} "
                      f"| {c['niter']} | {e['si_sdr']:.2f} "
                      f"| {e['estoi']:.3f} | {e['pesq']:.2f} |")


if __name__ == "__main__":
    main()
