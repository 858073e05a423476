#!/usr/bin/env python
"""serve.py boot-phase study: the time-to-ready evidence harness.

Boots the serving daemon up to three times against one AOT cache dir and
records, for each boot, the client-observed bind/ready/warmed wall times
plus the server's own /healthz boot-phase ledger and AOT counters, then
answers one real request:

  boot1  empty AOT cache, full warmup      (cold compile + first execute)
  boot2  AOT restore, normal readiness     (ready waits on first execution)
  boot3  AOT restore, --ready-on-aot-validate
         (ready on the host-side restore probe; warmed=false until the
          background warmup executions finish)

Produced `evidence/realchip_serve_boot_phases{,_r5}.json` (the round-4
boot dissection and the round-5 healthy-window measurement closing its
verdict). The reference has no serving story at all — its eval scripts
pay a full cold start per invocation (evaluate_ntcd_M1.py) — so this is
the ops-parity record: what a restart actually costs here, phase by
phase, and how the AOT cache + readiness modes bound it.

  python scripts/serve_boot_study.py --model-dir /tmp/r/models/ntcd_M1_... \
      --wav /tmp/r/data/.../test/34M/sa1.wav --aot-dir /tmp/r/aot \
      --out /tmp/r/boot_study.json
"""
import argparse
import json
import os
import pathlib
import signal
import subprocess
import sys
import time
import urllib.request

SCRIPTS = pathlib.Path(__file__).resolve().parent


def _get(port, path, timeout=3):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}",
                                timeout=timeout) as r:
        return json.loads(r.read())


def boot_once(tag, args, extra, log_dir):
    print(f"=== {tag} ===", flush=True)
    t0 = time.time()
    log = open(os.path.join(log_dir, f"serve_{tag}.log"), "w")
    p = subprocess.Popen(
        [sys.executable, str(SCRIPTS / "serve.py"),
         "--model-dir", args.model_dir, "--model-class", args.model_class,
         "--niter", str(args.niter),
         "--warmup-buckets", str(args.warmup_bucket),
         "--batch-size", str(args.batch_size),
         "--aot-cache", args.aot_dir, "--no-jit-cache",
         "--port", str(args.port)]
        + (["--platform", args.platform] if args.platform else [])
        + list(args.serve_args) + extra,
        cwd=SCRIPTS.parent, stdout=log, stderr=subprocess.STDOUT)
    rec = {"tag": tag, "argv_extra": extra, "bind_s": None, "ready_s": None,
           "warmed_s": None}
    deadline = t0 + args.boot_timeout
    try:
        while time.time() < deadline:
            try:
                h = _get(args.port, "/healthz")
            except Exception:
                if p.poll() is not None:
                    rec["died_rc"] = p.returncode
                    return rec
                time.sleep(0.2)
                continue
            now = time.time() - t0
            if rec["bind_s"] is None:
                rec["bind_s"] = round(now, 2)
            if rec["ready_s"] is None and h.get("ready"):
                rec["ready_s"] = round(now, 2)
                rec["ready_healthz"] = {k: h.get(k) for k in
                                        ("status", "ready", "warmed",
                                         "ready_via_aot", "aot")}
            if h.get("warmed") and rec["ready_s"] is not None:
                rec["warmed_s"] = round(now, 2)
                break
            time.sleep(0.3)
        else:
            # distinguish 'never observed warmed before the deadline' from
            # 'warmed just after the last poll' in the evidence record
            rec["timed_out_waiting"] = True
        body = open(args.wav, "rb").read()
        t1 = time.time()
        try:
            # the request shares the boot budget: a boot that already
            # timed out must not get a SECOND full boot_timeout here
            req_budget = max(30.0, deadline - time.time())
            req = urllib.request.Request(
                f"http://127.0.0.1:{args.port}/enhance", data=body)
            with urllib.request.urlopen(req, timeout=req_budget) as r:
                rec["first_request_bytes"] = len(r.read())
            rec["first_request_s"] = round(time.time() - t1, 3)
        except Exception as e:  # keep the boot record even if the
            rec["first_request_error"] = repr(e)  # request leg fails
        try:
            final = _get(args.port, "/healthz")
            rec["final_ledger"] = final.get("boot")
            rec["final_aot"] = final.get("aot")
            rec["ready_via_aot"] = final.get("ready_via_aot", False)
        except Exception as e:
            rec["final_healthz_error"] = repr(e)
    finally:
        p.send_signal(signal.SIGTERM)
        try:
            p.wait(timeout=60)
        except subprocess.TimeoutExpired:
            p.kill()
        log.close()
    return rec


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model-dir", required=True)
    ap.add_argument("--model-class", default="m1")
    ap.add_argument("--wav", required=True,
                    help="a 16 kHz wav POSTed once per boot (warm latency)")
    ap.add_argument("--aot-dir", required=True,
                    help="AOT cache dir shared by the boots (boot1 clears it "
                         "unless --skip-cold)")
    ap.add_argument("--out", default=None, help="JSON output path")
    ap.add_argument("--port", type=int, default=8571)
    ap.add_argument("--niter", type=int, default=100)
    ap.add_argument("--warmup-bucket", type=int, default=320)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--boot-timeout", type=float, default=1800.0)
    ap.add_argument("--platform", default=None,
                    help="forwarded to serve.py (e.g. cpu for a control run)")
    ap.add_argument("--skip-cold", action="store_true",
                    help="keep the existing AOT cache; skip boot1")
    ap.add_argument("serve_args", nargs="*",
                    help="extra serve.py args, forwarded verbatim — put "
                         "them after a literal '--' (e.g. -- --z-dim 4 "
                         "--h-dim 16 16 --nsamples-e-step 2)")
    args = ap.parse_args()

    os.makedirs(args.aot_dir, exist_ok=True)
    log_dir = os.path.dirname(os.path.abspath(args.out)) if args.out \
        else args.aot_dir
    boots = []
    if not args.skip_cold:
        # clear ONLY the AOT cache's own artifacts: a mistyped --aot-dir
        # (a model dir, a shared parent) must not have its files destroyed
        # by the cold leg, and a stray subdirectory must not abort the run
        for f in os.listdir(args.aot_dir):
            if f.startswith("core_") and (f.endswith(".aotx")
                                          or f.endswith(".bad")):
                os.unlink(os.path.join(args.aot_dir, f))
        boots.append(boot_once("boot1_empty_aot_full_warmup", args, [],
                               log_dir))
        time.sleep(5)
    boots.append(boot_once("boot2_aot_restore_normal", args, [], log_dir))
    time.sleep(5)
    boots.append(boot_once("boot3_aot_restore_ready_on_validate", args,
                           ["--ready-on-aot-validate"], log_dir))
    out = {"date": time.strftime("%Y-%m-%d"),
           "setup": {"model_dir": args.model_dir, "niter": args.niter,
                     "warmup_bucket": args.warmup_bucket,
                     "batch_size": args.batch_size},
           "boots": boots}
    text = json.dumps(out, indent=1)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text)
        print(f"wrote {args.out}")
    print(text)


if __name__ == "__main__":
    main()
