"""CLI: keygen / sign / verify / compress tooling and benches.

Usage:
  python -m babyjubjub_tpu keygen
  python -m babyjubjub_tpu pubkey  --key <hex32>
  python -m babyjubjub_tpu sign    --key <hex32> --msg <int>
  python -m babyjubjub_tpu verify  --pk <hex32> --sig <hex64> --msg <int>
  python -m babyjubjub_tpu verify-batch [--file sigs.jsonl]
  python -m babyjubjub_tpu bench   [--batch N]
  python -m babyjubjub_tpu report  [--batch N]

verify-batch reads JSONL records {"pk": <hex32>, "sig": <hex64>,
"msg": <int>} (stdin when --file is absent) and runs the whole file
through the fused wire-format batch pipeline in one device dispatch.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# honor an explicit platform request even when a site plugin pinned one
if os.environ.get("JAX_PLATFORMS"):
    import jax
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])


def main(argv=None):
    ap = argparse.ArgumentParser(prog="babyjubjub_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    sub.add_parser("keygen")
    p = sub.add_parser("pubkey")
    p.add_argument("--key", required=True)
    p = sub.add_parser("sign")
    p.add_argument("--key", required=True)
    p.add_argument("--msg", required=True)
    p = sub.add_parser("verify")
    p.add_argument("--pk", required=True)
    p.add_argument("--sig", required=True)
    p.add_argument("--msg", required=True)
    p = sub.add_parser("verify-batch")
    p.add_argument("--file", default=None)
    p = sub.add_parser("bench")
    p.add_argument("--batch", type=int, default=0)
    p.add_argument("--quick", action="store_true")
    p = sub.add_parser("report")
    p.add_argument("--batch", type=int, default=8192)

    args = ap.parse_args(argv)

    if args.cmd == "bench":
        import bench  # repo-root harness
        sys.argv = ["bench"] + (["--batch", str(args.batch)]
                                if args.batch else []) + \
            (["--quick"] if args.quick else [])
        return bench.main()

    import babyjubjub_tpu as bjj

    if args.cmd == "keygen":
        sk = bjj.new_key()
        pk = sk.public()
        print(json.dumps({"private_key": sk.key.hex(),
                          "public_key": pk.compress().hex()}))
    elif args.cmd == "pubkey":
        sk = bjj.PrivateKey(bytes.fromhex(args.key))
        print(json.dumps({"public_key": sk.public().compress().hex()}))
    elif args.cmd == "sign":
        sk = bjj.PrivateKey(bytes.fromhex(args.key))
        sig = sk.sign(int(args.msg))
        print(json.dumps({"signature": sig.compress().hex()}))
    elif args.cmd == "verify":
        pk = bjj.decompress_point(bytes.fromhex(args.pk))
        sig = bjj.decompress_signature(bytes.fromhex(args.sig))
        ok = bjj.verify(pk, sig, int(args.msg))
        print(json.dumps({"valid": bool(ok)}))
        return 0 if ok else 1
    elif args.cmd == "verify-batch":
        from babyjubjub_tpu.models import eddsa
        fh = open(args.file) if args.file else sys.stdin
        pks, sigs, msgs, parse_ok = [], [], [], []
        with fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                # malformed records become invalid lanes instead of
                # raising, consistent with the pipeline's nothing-raises
                # contract for bad-length byte rows
                try:
                    rec = json.loads(line)
                    pks.append(bytes.fromhex(rec["pk"]))
                    sigs.append(bytes.fromhex(rec["sig"]))
                    msgs.append(int(rec["msg"]))
                    parse_ok.append(True)
                except (ValueError, KeyError, TypeError):
                    pks.append(b"")
                    sigs.append(b"")
                    msgs.append(0)
                    parse_ok.append(False)
        if not pks:
            # an empty batch is reported explicitly, not "all valid"
            print(json.dumps({"count": 0, "ok": 0, "valid": [],
                              "error": "empty input"}))
            return 1
        oks = [bool(v and g) for v, g in
               zip(eddsa.verify_compressed_batch(pks, sigs, msgs), parse_ok)]
        print(json.dumps({"count": len(oks), "ok": sum(oks),
                          "valid": oks}))
        return 0 if all(oks) else 1
    elif args.cmd == "report":
        from babyjubjub_tpu.utils.profiling import op_report
        print(json.dumps({k: round(v, 1)
                          for k, v in op_report(args.batch).items()}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
