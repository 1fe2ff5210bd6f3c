"""C ABI surface tests (native/bpg_ffi.c — parity with the reference's
interfaces/ios FFI: c_prove -> ProofArtifacts, c_verify -> bool,
free_proof; /root/reference/interfaces/ios/src/lib.rs:11-66).

Two modes: ctypes-loading the library inside this process (the JNI-style
hosted case) and a standalone C driver that embeds CPython from scratch
(the iOS-style static case).
"""
import ctypes
import os
import subprocess
import sys
import sysconfig
from pathlib import Path

import pytest

HERE = Path(__file__).resolve().parent
REPO = HERE.parent
NATIVE = REPO / "bulletproof_gadgets_tpu" / "native"
RES = Path("/root/reference/tests/resources")


class ProofArtifacts(ctypes.Structure):
    _fields_ = [("commitments", ctypes.c_char_p),
                ("proof", ctypes.POINTER(ctypes.c_uint8)),
                ("len", ctypes.c_size_t),
                ("cap", ctypes.c_size_t)]


def _build_lib():
    r = subprocess.run(["make", "-C", str(NATIVE), "ffi"],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    return NATIVE / "libbpg_ffi.so"


@pytest.fixture(scope="module")
def lib():
    path = _build_lib()
    lib = ctypes.CDLL(str(path))
    lib.c_prove.restype = ctypes.POINTER(ProofArtifacts)
    lib.c_prove.argtypes = [ctypes.c_char_p] * 4
    lib.c_verify.restype = ctypes.c_int
    lib.c_verify.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                             ctypes.c_char_p, ctypes.c_size_t,
                             ctypes.c_char_p, ctypes.c_char_p]
    lib.free_proof.argtypes = [ctypes.POINTER(ProofArtifacts)]
    return lib


def _fixture(name):
    return ((RES / f"{name}.inst").read_bytes(),
            (RES / f"{name}.wtns").read_bytes(),
            (RES / f"{name}.gadgets").read_bytes())


def test_c_prove_verify_roundtrip(lib):
    inst, wtns, gad = _fixture("equality")
    art = lib.c_prove(b"equality", inst, wtns, gad)
    assert art, "c_prove returned NULL"
    a = art.contents
    assert a.len > 0
    proof = bytes(bytearray(a.proof[:a.len]))
    coms = a.commitments
    assert b"C0-0" in coms
    ok = lib.c_verify(b"equality", inst, proof, a.len, coms, gad)
    assert ok == 1
    # tampered proof must fail closed, not crash
    bad = bytearray(proof)
    bad[len(bad) // 2] ^= 0xFF
    assert lib.c_verify(b"equality", inst, bytes(bad), len(bad),
                        coms, gad) == 0
    lib.free_proof(art)


DRIVER = r"""
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include "bpg_ffi.h"

static char *slurp(const char *path) {
    FILE *f = fopen(path, "rb");
    if (!f) { perror(path); exit(2); }
    fseek(f, 0, SEEK_END); long n = ftell(f); fseek(f, 0, SEEK_SET);
    char *buf = malloc(n + 1);
    if (fread(buf, 1, n, f) != (size_t)n) exit(2);
    buf[n] = 0; fclose(f);
    return buf;
}

int main(int argc, char **argv) {
    if (argc < 2) return 2;
    const char *dir = argv[1];
    char p[512];
    snprintf(p, sizeof p, "%s/equality.inst", dir); char *inst = slurp(p);
    snprintf(p, sizeof p, "%s/equality.wtns", dir); char *wtns = slurp(p);
    snprintf(p, sizeof p, "%s/equality.gadgets", dir); char *gad = slurp(p);
    ProofArtifacts *art = c_prove("equality", inst, wtns, gad);
    if (!art) { fprintf(stderr, "prove failed\n"); return 1; }
    int ok = c_verify("equality", inst, art->proof, art->len,
                      art->commitments, gad);
    free_proof(art);
    printf(ok ? "true\n" : "false\n");
    return ok ? 0 : 1;
}
"""


@pytest.mark.slow
def test_standalone_embedding(tmp_path):
    """Compile a pure-C driver against libbpg_ffi.so and run it in a fresh
    process (CPython initialized by the library itself)."""
    _build_lib()
    src = tmp_path / "driver.c"
    src.write_text(DRIVER)
    exe = tmp_path / "driver"
    cflags = subprocess.run(["python3-config", "--includes"],
                            capture_output=True, text=True).stdout.split()
    r = subprocess.run(
        ["cc", "-o", str(exe), str(src), f"-I{NATIVE}", *cflags,
         f"-L{NATIVE}", "-lbpg_ffi", f"-Wl,-rpath,{NATIVE}"],
        capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    env = dict(os.environ)
    site = sysconfig.get_paths()["purelib"]
    env["PYTHONPATH"] = f"{REPO}:{site}"
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run([str(exe), str(RES)], capture_output=True, text=True,
                       env=env, timeout=600)
    assert r.returncode == 0, (r.stdout, r.stderr)
    assert r.stdout.strip() == "true"
