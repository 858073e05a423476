"""Numeric doc claims pinned to the evidence JSONs they cite.

The dotted-path resolver test (test_compat_packages.py::
test_guidance_dotted_paths_resolve) guards SYMBOL drift between docs and
code; this guards NUMBER drift between docs and evidence — a
three-round-running failure mode (round 3: stale engine row; round 4:
PARITY/CLAUDE said the AV-VAD budget was "150 epochs" while
evidence/av_fusion_matrix.json recorded budgets.epochs=60).

Every load-bearing figure that PARITY.md / README.md / MIGRATING.md /
COMPONENTS.md / CLAUDE.md quote from an evidence file is re-derived here
FROM that file, located in the doc by a regex anchored to its
surrounding prose, and compared numerically (tolerance = the doc's
quoted precision). Adding a number to a doc that comes from an evidence
JSON? Add a claim row.
"""

import json
import re
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def _load(name):
    with open(REPO / "evidence" / name) as f:
        return json.load(f)


def _cell(matrix, family, labels, niter):
    for c in matrix["cells"]:
        if (c["family"], c["labels"], c["niter"]) == (family, labels, niter):
            return c
    raise AssertionError(f"no cell {family}/{labels}/{niter}")


def _doc(name):
    # normalize the typographic minus so regexes can use ASCII '-'
    return (REPO / name).read_text().replace("−", "-")


AV = _load("av_fusion_matrix.json")
PEEM_MX = _load("peem_quality_matrix.json")
PMCEM_MX = _load("pmcem_quality_matrix.json")
PMCEM_EXP = _load("pmcem_experiment.json")
PEEM_ENGINE = _load("realchip_peem_engine.json")
PEEM_SWEEP = _load("peem_batch_sweep.json")

_f1 = AV["f1_per_condition"]
_enh = AV["enhancement"]
_b22 = _cell(PEEM_MX, "m2_ibm", "oracle-ibm", 100)
_c_m = _cell(PMCEM_MX, "m2_ibm", "oracle-ibm", 100)
_probe = PMCEM_EXP["mechanism_probes_m2_ibm_niter100"]
_dev = PMCEM_EXP["device_time_bench"]
_pe_bench = PEEM_ENGINE["bench_same_window"]
_b32 = next(r for r in PEEM_SWEEP["rows"] if r["batch"] == 32)

# (doc, regex over the normalized doc text, [expected values], [atol])
CLAIMS = [
    # ---- PARITY.md §2d: the AV-fusion dossier --------------------------
    ("PARITY.md", r"emb 32, (\d+) epochs",
     [AV["protocol"]["budgets"]["epochs"]], [0]),
    ("PARITY.md",
     r"\| Babble/-5 \| (-?\d+(?:\.\d+)?) \| (-?\d+(?:\.\d+)?) \| \*\*(-?\d+(?:\.\d+)?)\*\* \|",
     [_f1["audio"]["Babble/-5"]["f1"], _f1["video"]["Babble/-5"]["f1"],
      _f1["av"]["Babble/-5"]["f1"]], [6e-4] * 3),
    ("PARITY.md",
     r"\| LR/-5 \| (-?\d+(?:\.\d+)?) \| (-?\d+(?:\.\d+)?) \| \*\*(-?\d+(?:\.\d+)?)\*\* \|",
     [_f1["audio"]["LR/-5"]["f1"], _f1["video"]["LR/-5"]["f1"],
      _f1["av"]["LR/-5"]["f1"]], [6e-4] * 3),
    ("PARITY.md",
     r"\| mean \| (-?\d+(?:\.\d+)?) \| (-?\d+(?:\.\d+)?) \| \*\*(-?\d+(?:\.\d+)?)\*\* \|",
     [_f1["audio"]["overall_mean_f1"], _f1["video"]["overall_mean_f1"],
      _f1["av"]["overall_mean_f1"]], [6e-4] * 3),
    ("PARITY.md", r"\| oracle \| (-?\d+(?:\.\d+)?) dB \| — \|",
     [_enh["oracle"]["si_sdr"]], [6e-3]),
    ("PARITY.md", r"\| audio \| (-?\d+(?:\.\d+)?) dB \| (-?\d+(?:\.\d+)?) dB \|",
     [_enh["audio"]["si_sdr"], _enh["audio"]["delta_vs_oracle"]["si_sdr"]],
     [6e-3, 6e-3]),
    ("PARITY.md", r"\| video \| (-?\d+(?:\.\d+)?) dB \| (-?\d+(?:\.\d+)?) dB \|",
     [_enh["video"]["si_sdr"], _enh["video"]["delta_vs_oracle"]["si_sdr"]],
     [6e-3, 6e-3]),
    ("PARITY.md",
     r"\| \*\*AV\*\* \| \*\*(-?\d+(?:\.\d+)?) dB\*\* \| \*\*\+?(-?\d+(?:\.\d+)?) dB\*\* \|",
     [_enh["av"]["si_sdr"], _enh["av"]["delta_vs_oracle"]["si_sdr"]],
     [6e-3, 6e-3]),
    # ---- PARITY.md §2b: the engine-quality matrix ----------------------
    ("PARITY.md", r"SI-SDR (-?\d+(?:\.\d+)?) dB, ESTOI (-?\d+(?:\.\d+)?), PESQ (-?\d+(?:\.\d+)?)",
     [PEEM_MX["input_baseline"]["si_sdr"], PEEM_MX["input_baseline"]["estoi"],
      PEEM_MX["input_baseline"]["pesq"]], [6e-3, 6e-4, 6e-3]),
    ("PARITY.md",
     r"\| m2_ibm \| oracle-ibm \| 100 \|[^|]*\| \*\*(-?\d+(?:\.\d+)?) dB "
     r"\((-?\d+(?:\.\d+)?)σ\)",
     [_b22["peem_minus_mcem"]["si_sdr"],
      _b22["delta_in_seed_stds"]["si_sdr"]], [6e-3, 6e-3]),
    # ---- PARITY.md §2c: the pmcem experiment ---------------------------
    ("PARITY.md", r"\| peem \(point estimate\) \| (-?\d+(?:\.\d+)?) dB \((-?\d+(?:\.\d+)?)σ\)",
     [_c_m["peem_minus_mcem"]["si_sdr"],
      _c_m["peem_delta_in_seed_stds"]["si_sdr"]], [6e-3, 6e-2]),
    ("PARITY.md",
     r"matched eval budget\) \| \*\*(-?\d+(?:\.\d+)?) dB \((-?\d+(?:\.\d+)?)σ\)\*\*",
     [_c_m["pmcem_minus_mcem"]["si_sdr"],
      _c_m["pmcem_delta_in_seed_stds"]["si_sdr"]], [6e-3, 6e-2]),
    ("PARITY.md", r"3× width\) \| (-?\d+(?:\.\d+)?) dB \((-?\d+(?:\.\d+)?)σ\)",
     [_probe["width_steps4_chains30"]["pmcem_minus_mcem"]["si_sdr"],
      _probe["width_steps4_chains30"]["pmcem_delta_in_seed_stds"]["si_sdr"]],
     [6e-3, 6e-2]),
    ("PARITY.md", r"3× depth\) \| (-?\d+(?:\.\d+)?) dB \((-?\d+(?:\.\d+)?)σ\)",
     [_probe["depth_steps12_chains10"]["pmcem_minus_mcem"]["si_sdr"],
      _probe["depth_steps12_chains10"]["pmcem_delta_in_seed_stds"]["si_sdr"]],
     [6e-3, 6e-2]),
    ("PARITY.md", r"measures \*\*(\d+) ms/batch\s+vs MCEM's (\d+)\*\*",
     [_dev["pmcem_defaults"]["device_ms_per_batch"],
      _dev["mcem"]["device_ms_per_batch"]], [0, 0]),
    # ---- README.md -----------------------------------------------------
    ("README.md", r"AV F1 (-?\d+(?:\.\d+)?) ≥ max\(audio (-?\d+(?:\.\d+)?),\s*video (-?\d+(?:\.\d+)?)\)",
     [_f1["av"]["overall_mean_f1"], _f1["audio"]["overall_mean_f1"],
      _f1["video"]["overall_mean_f1"]], [6e-4] * 3),
    ("README.md", r"closest of the three to oracle\s+conditioning "
                  r"\(\+(-?\d+(?:\.\d+)?) dB\)",
     [_enh["av"]["delta_vs_oracle"]["si_sdr"]], [6e-3]),
    ("README.md", r"\*\*(-?\d+(?:\.\d+)?) ms of pure device time\s+per "
                  r"32-utt batch\s+\((\d+) utt/s device",
     [_b32["device_ms"], _b32["device_utt_per_sec"]], [0.05, 0.6]),
    ("README.md", r"RTT-inclusive\s+readings are (\d+) vs (\d+) ms",
     [_b32["t_batch_ms"], _pe_bench["mcem"]["device_ms_per_batch"]],
     [0.5, 0.5]),
    # ---- MIGRATING.md ----------------------------------------------------
    ("MIGRATING.md", r"\((\d+) vs (\d+) ms/batch\)",
     [_dev["pmcem_defaults"]["device_ms_per_batch"],
      _dev["mcem"]["device_ms_per_batch"]], [0, 0]),
    ("MIGRATING.md", r"\((-?\d+(?:\.\d+)?) dB on IBM-conditioned M2\)",
     [_c_m["pmcem_minus_mcem"]["si_sdr"]], [0.05]),
    # ---- COMPONENTS.md ---------------------------------------------------
    ("COMPONENTS.md", r"(-?\d+(?:\.\d+)?)× device speedup",
     [_pe_bench["mcem"]["device_ms_per_batch"]
      / _pe_bench["peem"]["device_ms_per_batch"]], [0.06]),
    # ---- CLAUDE.md (working notes quote the same study budget) ----------
    ("CLAUDE.md", r"64x1, emb 32, (\d+) ep, CPU",
     [AV["protocol"]["budgets"]["epochs"]], [0]),
]

# ---- roofline dossier (PARITY.md §2e + README) --------------------------
ROOF = _load("roofline.json")
_rc = ROOF["fit"]["coefficients_us"]
_rp = ROOF["phase_roofline"]
_rd = ROOF["default_budget_decomposition_ms"]
CLAIMS += [
    ("PARITY.md",
     r"\| MH burn-in step \| (-?\d+(?:\.\d+)?) \| (-?\d+(?:\.\d+)?) MB \| "
     r"\*\*(-?\d+(?:\.\d+)?) \((-?\d+(?:\.\d+)?)% of the (\d+) peak\)\*\* "
     r"\| (-?\d+(?:\.\d+)?) ms \|",
     [_rc["c_burn_per_mh_step"],
      _rp["mh_burn_step"]["bytes_per_unit_MB_fused"],
      _rp["mh_burn_step"]["implied_achieved_GBps_fused"],
      100 * _rp["mh_burn_step"]["implied_achieved_GBps_fused"]
      / ROOF["hbm_peak_GBps"],
      ROOF["hbm_peak_GBps"], _rd["e_step_burnin"]],
     [0.05, 0.05, 0.5, 0.06, 0, 0.05]),
    ("PARITY.md",
     r"\| MH collect step \| (-?\d+(?:\.\d+)?) \| (-?\d+(?:\.\d+)?) MB \| "
     r"(-?\d+(?:\.\d+)?) \| (-?\d+(?:\.\d+)?) ms \|",
     [_rc["c_coll_per_mh_step"],
      _rp["mh_collect_step"]["bytes_per_unit_MB_fused"],
      _rp["mh_collect_step"]["implied_achieved_GBps_fused"],
      _rd["e_step_collect"]],
     [0.05, 0.05, 0.5, 0.05]),
    ("PARITY.md",
     r"\| WF tail \(75\+25 steps\) \| (-?\d+(?:\.\d+)?)/(-?\d+(?:\.\d+)?) "
     r"\| (-?\d+(?:\.\d+)?)/(-?\d+(?:\.\d+)?) MB \| "
     r"~(-?\d+(?:\.\d+)?)/(-?\d+(?:\.\d+)?) \|",
     [_rc["c_wfb_per_step"], _rc["c_wfs_per_step"],
      _rp["wf_burn_step"]["bytes_per_unit_MB_fused"],
      _rp["wf_step"]["bytes_per_unit_MB_fused"],
      _rp["wf_burn_step"]["implied_achieved_GBps_fused"],
      _rp["wf_step"]["implied_achieved_GBps_fused"]],
     [0.05, 0.05, 0.05, 0.05, 0.5, 0.5]),
    ("README.md",
     r"\*\*(-?\d+(?:\.\d+)?) GB/s vs the (\d+) GB/s v5e\s+HBM peak "
     r"\((-?\d+(?:\.\d+)?)%\)\*\*",
     [_rp["mh_burn_step"]["implied_achieved_GBps_fused"],
      ROOF["hbm_peak_GBps"],
      100 * _rp["mh_burn_step"]["implied_achieved_GBps_fused"]
      / ROOF["hbm_peak_GBps"]],
     [0.5, 0, 0.06]),
    ("README.md", r"(-?\d+(?:\.\d+)?)% fit error",
     [100 * ROOF["fit"]["max_rel_fit_error"]], [0.006]),
    ("README.md", r"(-?\d+(?:\.\d+)?)% MFU",
     [ROOF["mxu"]["mfu_pct"]], [0.06]),
    ("PARITY.md", r"(-?\d+(?:\.\d+)?)% MFU",
     [ROOF["mxu"]["mfu_pct"]], [0.06]),
]

# ---- roofline speed-of-light block (round-5 attribution correction) -----
_sol = ROOF["speed_of_light"]
CLAIMS += [
    ("PARITY.md",
     r"(-?\d+(?:\.\d+)?) GB\s+moved per 32-utt batch → a "
     r"(-?\d+(?:\.\d+)?) ms speed-of-light floor at peak\s+bandwidth vs "
     r"(-?\d+(?:\.\d+)?) ms measured engine time",
     [_sol["fused_ledger_bytes_GB_default_budget"],
      _sol["floor_ms_at_peak_bw"], _sol["engine_ms_ex_rtt"]], [0.05] * 3),
    ("PARITY.md", r"\*\*(-?\d+(?:\.\d+)?)% of its recorded\s+speed of light\*\*",
     [_sol["pct_of_speed_of_light"]], [0.05]),
    ("README.md",
     r"ledgers sum to (-?\d+(?:\.\d+)?) GB per batch \(a "
     r"(-?\d+(?:\.\d+)?) ms hard floor at peak vs\s+"
     r"(-?\d+(?:\.\d+)?) ms engine time — \*\*(-?\d+(?:\.\d+)?)% of "
     r"recorded speed of light\*\*\)",
     [_sol["fused_ledger_bytes_GB_default_budget"],
      _sol["floor_ms_at_peak_bw"], _sol["engine_ms_ex_rtt"],
      _sol["pct_of_speed_of_light"]], [0.05] * 4),
    ("PARITY.md", r"implies 778 GB/s =\s+\*\*95\.0% of peak\*\*",
     [], []),
]

# ---- round-5 AV strong-operating-point leg (PARITY.md §2d addendum) -----
AVS = _load("av_fusion_matrix_strong.json")
_sf1 = AVS["f1_per_condition"]
_senh = AVS["enhancement"]
CLAIMS += [
    # the strong table's mean row (4-decimal F1s distinguish it from the
    # matched-budget table's mean row earlier in the same section)
    ("PARITY.md", r"\| mean \| (0\.99\d+) \| (0\.98\d+) \| \*\*(0\.99\d+)\*\* \|",
     [_sf1["audio"]["overall_mean_f1"], _sf1["video"]["overall_mean_f1"],
      _sf1["av"]["overall_mean_f1"]], [6e-4] * 3),
    ("PARITY.md",
     r"audio \+(\d+\.\d+), video \+(\d+\.\d+), AV -(\d+\.\d+) dB",
     [_senh["audio"]["delta_vs_oracle"]["si_sdr"],
      _senh["video"]["delta_vs_oracle"]["si_sdr"],
      -_senh["av"]["delta_vs_oracle"]["si_sdr"]], [6e-3] * 3),
    ("PARITY.md", r"150 epochs, seed 0, std-norm\) but",
     [], []),
    ("PARITY.md", r"margin is large \((0\.\d+) vs (0\.\d+)/(0\.\d+)\)",
     [_f1["av"]["overall_mean_f1"], _f1["audio"]["overall_mean_f1"],
      _f1["video"]["overall_mean_f1"]], [6e-4] * 3),
]

# ---- round-5 serve boot study (README) ----------------------------------
BOOT5 = _load("realchip_serve_boot_phases_r5.json")
_b5 = BOOT5["headline"]
CLAIMS += [
    ("README.md",
     r"empty AOT cache ready in (-?\d+(?:\.\d+)?) s, AOT-restore boot "
     r"ready in (-?\d+(?:\.\d+)?) s, and\s+with `--ready-on-aot-validate` "
     r"ready in (-?\d+(?:\.\d+)?) s",
     [_b5["full_warmup_cold_aot_ready_s"],
      _b5["aot_restore_normal_ready_s"],
      _b5["aot_restore_ready_on_validate_ready_s"]], [0.05] * 3),
    ("README.md",
     r"warmup finishing (-?\d+(?:\.\d+)?) s in and the first request "
     r"answered\s+in (-?\d+(?:\.\d+)?) s",
     [_b5["ready_on_validate_warmed_s"],
      _b5["first_request_after_ready_s"]], [0.05, 0.005]),
]


def test_doc_numbers_match_evidence():
    docs = {name: _doc(name) for name in {c[0] for c in CLAIMS}}
    failures = []
    for doc, pattern, expect, atols in CLAIMS:
        m = re.search(pattern, docs[doc])
        if not m:
            failures.append(f"{doc}: claim text not found: /{pattern}/")
            continue
        got = [float(g) for g in m.groups()]
        for g, e, a in zip(got, expect, atols):
            if abs(g - float(e)) > a + 1e-12:
                failures.append(
                    f"{doc}: /{pattern}/ quotes {g} but evidence says "
                    f"{e} (atol {a})")
    assert not failures, "\n".join(failures)


def test_claims_cover_the_cited_evidence_files():
    """Each evidence file a claim derives from must still be cited by
    name in at least one of the docs that quote its numbers — keeps the
    claim table honest about provenance."""
    cited_in = {
        "av_fusion_matrix.json": ("PARITY.md", "README.md"),
        "peem_quality_matrix.json": ("PARITY.md", "MIGRATING.md"),
        "pmcem_quality_matrix.json": ("PARITY.md",),
        "pmcem_experiment.json": ("PARITY.md",),
        "realchip_peem_engine.json": ("MIGRATING.md",),
        "peem_batch_sweep.json": ("README.md",),
        "roofline.json": ("PARITY.md", "README.md"),
        "realchip_serve_boot_phases_r5.json": ("README.md",),
        "av_fusion_matrix_strong.json": ("PARITY.md",),
    }
    for ev, docs in cited_in.items():
        assert (REPO / "evidence" / ev).exists(), ev
        for doc in docs:
            assert ev in (REPO / doc).read_text(), f"{doc} no longer cites {ev}"
