"""Proof service round-trip over HTTP (FFI-surface analogue)."""
import json
import threading
import urllib.request

from http.server import ThreadingHTTPServer

from bulletproof_gadgets_tpu.cli.serve import Handler
from bulletproof_gadgets_tpu.utils import rng


def _post(port, path, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=120) as r:
        return json.loads(r.read())


def test_serve_prove_verify():
    rng.set_seed("serve")
    server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    port = server.server_address[1]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        base = "/root/reference/tests/resources/equality"
        with open(base + ".inst") as f:
            inst = f.read()
        with open(base + ".wtns") as f:
            wtns = f.read()
        with open(base + ".gadgets") as f:
            gads = f.read()
        out = _post(port, "/prove", {
            "name": "equality", "instance": inst, "witness": wtns,
            "gadgets": gads})
        assert out["constraints"] > 0
        res = _post(port, "/verify", {
            "name": "equality", "instance": inst, "proof": out["proof"],
            "commitments": out["commitments"], "gadgets": gads})
        assert res["verified"] is True
        # tampered proof rejected
        bad = bytearray(bytes.fromhex(out["proof"])); bad[70] ^= 1
        res2 = _post(port, "/verify", {
            "name": "equality", "instance": inst, "proof": bad.hex(),
            "commitments": out["commitments"], "gadgets": gads})
        assert res2["verified"] is False
    finally:
        server.shutdown()
        rng.set_seed(None)
