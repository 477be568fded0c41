"""Auxiliary subsystem tests: config, CLI, error-surface parity,
modsqrt variants (reference utils.rs:164-260), BLAKE backends."""

import json
import random
import subprocess
import sys

import pytest

from babyjubjub_tpu.utils import hostmath as H, blake512, codec
from babyjubjub_tpu.utils.config import Config


def test_modsqrt_variants_agree():
    # reference test_sqrtmod (utils.rs:239-260) + random agreement
    a = 6536923810004159332831702809452452174451353762940761092345538667656658715568
    q = 7237005577332262213973186563042994240857116359379907606001950938285454250989
    want = 5464794816676661649783249706827271879994893912039750480019443499440603127256
    assert H.modsqrt(a, q) == want
    assert H.modsqrt_v2(a, q) == want
    rng = random.Random(9)
    for _ in range(10):
        v = rng.randrange(H.Q)
        sq = v * v % H.Q
        r1, r2 = H.modsqrt(sq, H.Q), H.modsqrt_v2(sq, H.Q)
        assert r1 == r2 and (r1 * r1) % H.Q == sq


def test_error_surface_parity():
    # validation errors mirror the reference's Result::Err strings
    import babyjubjub_tpu as bjj
    with pytest.raises(ValueError, match="bigger than"):
        bjj.PrivateKey(b"\x00" * 31)
    with pytest.raises(ValueError, match="Finite Field"):
        codec.decompress_point(int(H.Q).to_bytes(32, "little"))
    with pytest.raises(ValueError, match="not a mod p square"):
        H.modsqrt(0, H.Q)
    with pytest.raises(ValueError, match="no mod inv of Zero"):
        H.modinv(0, H.Q)


def test_blake_backends_agree():
    msgs = [b"", b"\x00", b"a" * 111, b"b" * 128, b"c" * 200]
    for m in msgs:
        assert blake512.digest(m) == blake512._digest_py(m)


def test_config_defaults():
    c = Config()
    assert c.tile == 512 and c.window == 4


def test_cli_keygen_sign_verify():
    out = subprocess.run(
        [sys.executable, "-m", "babyjubjub_tpu", "keygen"],
        capture_output=True, text=True, cwd="/root/repo",
        env=_cpu_env(), timeout=600)
    assert out.returncode == 0, out.stderr[-800:]
    kg = json.loads(out.stdout.strip().splitlines()[-1])
    assert len(bytes.fromhex(kg["private_key"])) == 32
    assert len(bytes.fromhex(kg["public_key"])) == 32


def _cpu_env():
    import os
    env = dict(os.environ)
    env["BJJ_BACKEND"] = "cpu"
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_COMPILATION_CACHE_DIR"] = "/root/repo/.jax_cache"
    return env
