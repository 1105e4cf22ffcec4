"""HTTPS forge key fetch (lib/crypto/https_keys.c role) against a LOCAL
self-signed TLS server — real ssl handshake + GET, zero egress (the same
fake-server pattern as the UPnP router and update-checker tests)."""

import datetime
import http.server
import os
import ssl
import subprocess
import sys
import threading
import time

import pytest

from asciichat_tpu.net.httpskeys import load_allowed_keys
from asciichat_tpu.net.sshauth import SshAuthError

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _make_cert(tmp_path):
    """Self-signed cert for 127.0.0.1 (test CA = the leaf itself)."""
    from cryptography import x509
    from cryptography.hazmat.primitives import hashes, serialization
    from cryptography.hazmat.primitives.asymmetric import ec
    from cryptography.x509.oid import NameOID

    key = ec.generate_private_key(ec.SECP256R1())
    name = x509.Name([x509.NameAttribute(NameOID.COMMON_NAME, "127.0.0.1")])
    now = datetime.datetime.now(datetime.timezone.utc)
    cert = (
        x509.CertificateBuilder()
        .subject_name(name).issuer_name(name).public_key(key.public_key())
        .serial_number(x509.random_serial_number())
        .not_valid_before(now - datetime.timedelta(minutes=5))
        .not_valid_after(now + datetime.timedelta(hours=1))
        .add_extension(
            x509.SubjectAlternativeName([x509.IPAddress(
                __import__("ipaddress").ip_address("127.0.0.1"))]),
            critical=False)
        .sign(key, hashes.SHA256())
    )
    certfile = tmp_path / "cert.pem"
    keyfile = tmp_path / "key.pem"
    certfile.write_bytes(cert.public_bytes(serialization.Encoding.PEM))
    keyfile.write_bytes(key.private_bytes(
        serialization.Encoding.PEM, serialization.PrivateFormat.PKCS8,
        serialization.NoEncryption()))
    return str(certfile), str(keyfile)


def _ed25519_openssh_line(comment="t"):
    from cryptography.hazmat.primitives.asymmetric.ed25519 import Ed25519PrivateKey
    from cryptography.hazmat.primitives.serialization import Encoding, PublicFormat

    k = Ed25519PrivateKey.generate()
    line = k.public_key().public_bytes(
        Encoding.OpenSSH, PublicFormat.OpenSSH).decode() + f" {comment}"
    return k, line


class _FakeForge(http.server.BaseHTTPRequestHandler):
    pages: dict = {}

    def log_message(self, *a):
        pass

    def do_GET(self):
        body = self.pages.get(self.path)
        if body is None:
            self.send_response(404)
            self.end_headers()
            return
        self.send_response(200)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


def _serve_tls(tmp_path, pages):
    certfile, keyfile = _make_cert(tmp_path)
    _FakeForge.pages = pages
    httpd = http.server.HTTPServer(("127.0.0.1", 0), _FakeForge)
    ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
    ctx.load_cert_chain(certfile, keyfile)
    httpd.socket = ctx.wrap_socket(httpd.socket, server_side=True)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    return httpd, httpd.server_address[1], certfile


def test_fetch_forge_keys_over_real_tls(tmp_path):
    _k, line = _ed25519_openssh_line("alice@laptop")
    rsa_line = "ssh-rsa AAAAB3NzaC1yc2EAAAAD skipped-key-type"
    httpd, port, certfile = _serve_tls(tmp_path, {
        "/alice.keys": (line + "\n" + rsa_line + "\n").encode(),
        "/huge.keys": b"x" * (300 * 1024),
    })
    urls = {"github": f"https://127.0.0.1:{port}/{{user}}.keys"}
    try:
        allowed = load_allowed_keys("github:alice", forge_urls=urls,
                                    cafile=certfile)
        assert len(allowed) == 1  # the rsa line is skipped, ed25519 kept

        # certificate verification is ENFORCED: default trust store must
        # reject the self-signed server
        with pytest.raises(SshAuthError):
            load_allowed_keys("github:alice", forge_urls=urls)
        # response size cap
        with pytest.raises(SshAuthError):
            load_allowed_keys("github:huge", forge_urls=urls, cafile=certfile)
        # malformed specs / usernames
        with pytest.raises(SshAuthError):
            load_allowed_keys("github:", forge_urls=urls, cafile=certfile)
        with pytest.raises(SshAuthError):
            load_allowed_keys("github:../evil", forge_urls=urls, cafile=certfile)
        # 404 user
        with pytest.raises(SshAuthError):
            load_allowed_keys("github:nobody", forge_urls=urls, cafile=certfile)
    finally:
        httpd.shutdown()


def test_forge_keys_gate_real_server(tmp_path):
    """End-to-end: server --allowed-keys github:alice (fetched from the fake
    forge over HTTPS via env overrides) admits alice's key and refuses an
    unlisted one — the https_keys.c -> handshake whitelist chain."""
    from cryptography.hazmat.primitives.serialization import (
        Encoding, NoEncryption, PrivateFormat,
    )

    good, line = _ed25519_openssh_line("alice")
    evil, _ = _ed25519_openssh_line("evil")
    httpd, fport, certfile = _serve_tls(tmp_path, {
        "/alice.keys": (line + "\n").encode(),
    })
    for name, key in (("good", good), ("evil", evil)):
        (tmp_path / name).write_bytes(key.private_bytes(
            Encoding.PEM, PrivateFormat.OpenSSH, NoEncryption()))

    port = 21000 + os.getpid() % 20000 + 28
    env = {**os.environ, "ASCIICHAT_JAX_PLATFORM": "cpu", "PYTHONPATH": REPO,
           "ASCIICHAT_FORGE_URLS":
               '{"github": "https://127.0.0.1:%d/{user}.keys"}' % fport,
           "ASCIICHAT_FORGE_CA": certfile}

    def spawn(*args):
        return subprocess.Popen(
            [sys.executable, "-m", "asciichat_tpu.apps.main", *args],
            env=env, cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE)

    srv = spawn("server", "--port", str(port), "--allowed-keys", "github:alice",
                "--log-level", "INFO")
    time.sleep(4)
    try:
        assert srv.poll() is None, srv.stderr.read().decode()[-2000:]
        ok = spawn("client", "127.0.0.1", "--port", str(port), "--test-pattern",
                   "--ssh-key", str(tmp_path / "good"), "--width", "40",
                   "--height", "10", "--color-mode", "NONE", "--max-frames", "3",
                   "--no-reconnect", "--log-level", "INFO")
        out, err = ok.communicate(timeout=180)
        assert ok.returncode == 0, err.decode()[-2000:]
        assert len(out) > 100  # frames through the key-gated session

        bad = spawn("client", "127.0.0.1", "--port", str(port), "--test-pattern",
                    "--ssh-key", str(tmp_path / "evil"), "--max-frames", "2",
                    "--no-reconnect", "--log-level", "WARNING")
        out, err = bad.communicate(timeout=180)
        assert bad.returncode != 0 or b"\x1b[" not in out
        assert srv.poll() is None
    finally:
        srv.terminate()
        srv.wait(timeout=10)
        httpd.shutdown()


def test_forge_username_allowlist_and_custom_forge_override(monkeypatch, tmp_path):
    """(a) control characters in a username must produce SshAuthError (an
    attacker-shaped spec used to escape as raw InvalidURL); (b) a
    custom-named forge from ASCIICHAT_FORGE_URLS must take the HTTPS
    branch, not be misread as a file path."""
    import json

    import pytest

    from asciichat_tpu.net.httpskeys import fetch_keys_text, load_allowed_keys
    from asciichat_tpu.net.sshauth import SshAuthError

    for bad in ("github:alice\rX", "github:a/../b", "github:a b",
                "github:", "github:ali\nce"):
        with pytest.raises(SshAuthError):
            fetch_keys_text(bad)

    monkeypatch.setenv("ASCIICHAT_FORGE_URLS", json.dumps(
        {"myforge": "https://127.0.0.1:1/{user}.keys"}))
    # the custom forge spec must NOT be treated as a file path; it reaches
    # the HTTPS fetch (which fails cleanly against the dead port -> the
    # SshAuthError contract, not FileNotFoundError)
    with pytest.raises(SshAuthError):
        load_allowed_keys("myforge:alice", timeout=0.3)


def test_https_downgrade_redirect_refused(tmp_path):
    """A forge answering 302 -> http://... must NOT be followed: urllib's
    default redirect handler would silently downgrade a certificate-verified
    fetch of auth material to plaintext. The fetch fails with SshAuthError."""

    class _RedirectingForge(_FakeForge):
        def do_GET(self):
            if self.path == "/alice.keys":
                self.send_response(302)
                self.send_header("Location", "http://127.0.0.1:1/alice.keys")
                self.send_header("Content-Length", "0")
                self.end_headers()
                return
            super().do_GET()

    certfile, keyfile = _make_cert(tmp_path)
    httpd = http.server.HTTPServer(("127.0.0.1", 0), _RedirectingForge)
    ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
    ctx.load_cert_chain(certfile, keyfile)
    httpd.socket = ctx.wrap_socket(httpd.socket, server_side=True)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    port = httpd.server_address[1]
    urls = {"github": f"https://127.0.0.1:{port}/{{user}}.keys"}
    try:
        with pytest.raises(SshAuthError, match="non-HTTPS redirect"):
            load_allowed_keys("github:alice", forge_urls=urls,
                              cafile=certfile)
    finally:
        httpd.shutdown()


def test_bad_forge_urls_env_is_clean_error(monkeypatch):
    """A typo'd ASCIICHAT_FORGE_URLS surfaces as SshAuthError (the module's
    documented contract), not a JSONDecodeError traceback at startup."""
    monkeypatch.setenv("ASCIICHAT_FORGE_URLS", "{not json")
    with pytest.raises(SshAuthError, match="ASCIICHAT_FORGE_URLS"):
        load_allowed_keys("github:alice")
    # valid JSON of the wrong shape is refused too
    monkeypatch.setenv("ASCIICHAT_FORGE_URLS", '["github"]')
    with pytest.raises(SshAuthError, match="ASCIICHAT_FORGE_URLS"):
        load_allowed_keys("github:alice")


def test_plain_http_forge_url_refused(monkeypatch):
    """Key material is HTTPS-only: an http:// base URL (misconfigured env
    override) is refused up front, before any plaintext GET happens."""
    import json

    monkeypatch.setenv("ASCIICHAT_FORGE_URLS", json.dumps(
        {"myforge": "http://127.0.0.1:1/{user}.keys"}))
    with pytest.raises(SshAuthError, match="must be https"):
        load_allowed_keys("myforge:alice", timeout=0.3)
