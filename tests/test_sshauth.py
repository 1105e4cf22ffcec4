"""SSH identity auth: agent protocol, key files, authorized_keys whitelist,
handshake integration (lib/crypto/ssh/{ssh_agent,ssh_keys}.c +
handshake/server.c client_whitelist)."""

import asyncio
import os
import socket
import struct
import threading

import pytest
from cryptography.hazmat.primitives.asymmetric.ed25519 import Ed25519PrivateKey
from cryptography.hazmat.primitives.serialization import (
    Encoding, NoEncryption, PrivateFormat, PublicFormat,
)

from asciichat_tpu.net import sshauth as sa


def _keypair():
    priv = Ed25519PrivateKey.generate()
    return priv, sa.pubkey_blob(priv.public_key())


def test_blob_roundtrip_and_auth_response():
    priv, blob = _keypair()
    assert sa.parse_pubkey_blob(blob).public_bytes_raw() == \
        priv.public_key().public_bytes_raw()
    ident = sa.SshIdentity(blob, priv.sign)
    allowed = sa.AuthorizedKeys([blob])
    chal, shared = os.urandom(32), os.urandom(32)
    resp = sa.make_auth_response(ident, chal, shared)
    assert sa.verify_auth_response(resp, chal, shared, allowed)
    # replay to a different session (different shared key) fails: DH binding
    assert not sa.verify_auth_response(resp, chal, os.urandom(32), allowed)
    # unlisted key fails even with a valid signature
    other_priv, other_blob = _keypair()
    resp2 = sa.make_auth_response(sa.SshIdentity(other_blob, other_priv.sign),
                                  chal, shared)
    assert not sa.verify_auth_response(resp2, chal, shared, allowed)
    # tampered payload fails
    bad = bytearray(resp)
    bad[-1] ^= 0xFF
    assert not sa.verify_auth_response(bytes(bad), chal, shared, allowed)


def test_authorized_keys_and_private_key_files(tmp_path):
    priv, blob = _keypair()
    pub_line = priv.public_key().public_bytes(
        Encoding.OpenSSH, PublicFormat.OpenSSH).decode()
    ak = tmp_path / "authorized_keys"
    ak.write_text(f"# comment line\n{pub_line} test@host\n\n")
    allowed = sa.AuthorizedKeys.load(str(ak))
    assert blob in allowed and len(allowed) == 1

    key_file = tmp_path / "id_ed25519"
    key_file.write_bytes(priv.private_bytes(
        Encoding.PEM, PrivateFormat.OpenSSH, NoEncryption()))
    ident = sa.SshIdentity.from_private_key_file(str(key_file))
    assert ident.key_blob == blob
    chal, shared = os.urandom(32), os.urandom(32)
    assert sa.verify_auth_response(
        sa.make_auth_response(ident, chal, shared), chal, shared, allowed)


class FakeAgent(threading.Thread):
    """Minimal ssh-agent serving REQUEST_IDENTITIES + SIGN_REQUEST over a
    unix socket (the protocol surface ssh_agent.c:62-360 talks to)."""

    def __init__(self, sock_path, priv):
        super().__init__(daemon=True)
        self.priv = priv
        self.blob = sa.pubkey_blob(priv.public_key())
        self.srv = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        self.srv.bind(sock_path)
        self.srv.listen(1)

    def run(self):
        while True:
            try:
                conn, _ = self.srv.accept()
            except OSError:
                return
            try:
                while True:
                    hdr = conn.recv(4)
                    if len(hdr) < 4:
                        break
                    (n,) = struct.unpack(">I", hdr)
                    msg = b""
                    while len(msg) < n:
                        msg += conn.recv(n - len(msg))
                    if msg[0] == sa.SSH2_AGENTC_REQUEST_IDENTITIES:
                        body = (bytes([sa.SSH2_AGENT_IDENTITIES_ANSWER])
                                + struct.pack(">I", 1)
                                + sa._s(self.blob) + sa._s(b"fake@agent"))
                    elif msg[0] == sa.SSH2_AGENTC_SIGN_REQUEST:
                        blob, at = sa._read_s(msg, 1)
                        data, at = sa._read_s(msg, at)
                        sig = self.priv.sign(data)
                        body = (bytes([sa.SSH2_AGENT_SIGN_RESPONSE])
                                + sa._s(sa.sig_blob(sig)))
                    else:
                        body = bytes([sa.SSH_AGENT_FAILURE])
                    conn.sendall(struct.pack(">I", len(body)) + body)
            finally:
                conn.close()


def test_ssh_agent_protocol(tmp_path):
    priv, blob = _keypair()
    sock = str(tmp_path / "agent.sock")
    agent_srv = FakeAgent(sock, priv)
    agent_srv.start()
    try:
        agent = sa.SshAgent(sock)
        ids = agent.list_identities()
        assert ids == [(blob, "fake@agent")]
        ident = sa.SshIdentity.from_agent(agent)
        assert ident.key_blob == blob
        sig = ident.sign(b"challenge-bytes")
        priv.public_key().verify(sig, b"challenge-bytes")  # raises if bad
        agent.close()
    finally:
        agent_srv.srv.close()

    with pytest.raises(sa.SshAuthError):
        sa.SshAgent(str(tmp_path / "missing.sock"))


def test_handshake_with_ssh_key_auth(tmp_path):
    """Full handshake over a real socket: SSH-key client accepted, wrong-key
    client rejected, HMAC path unaffected."""
    from asciichat_tpu.net.crypto import CryptoContext
    from asciichat_tpu.net.handshake import (
        HandshakeError, client_handshake, server_handshake,
    )
    from asciichat_tpu.net.transport import Transport, connect_tcp

    priv, blob = _keypair()
    evil_priv, evil_blob = _keypair()
    allowed = sa.AuthorizedKeys([blob])

    async def run():
        results = {}

        async def on_server(t: Transport):
            ctx = CryptoContext()
            first = await t.recv()
            try:
                results["ok"] = await server_handshake(
                    t, ctx, first, allowed_keys=allowed)
            except HandshakeError as e:
                results["err"] = str(e)

        server = await asyncio.start_server(
            lambda r, w: on_server(Transport(r, w)), "127.0.0.1", 0)
        port = server.sockets[0].getsockname()[1]

        # good key
        t = await connect_tcp("127.0.0.1", port)
        ident = sa.SshIdentity(blob, priv.sign)
        assert await client_handshake(t, CryptoContext(), ssh_identity=ident)
        await t.close()
        await asyncio.sleep(0.1)
        assert results.pop("ok") is True

        # wrong key
        t = await connect_tcp("127.0.0.1", port)
        evil = sa.SshIdentity(evil_blob, evil_priv.sign)
        with pytest.raises(Exception):
            await client_handshake(t, CryptoContext(), ssh_identity=evil)
        await t.close()
        await asyncio.sleep(0.1)
        assert "authentication" in results.pop("err", "")
        server.close()

    asyncio.run(asyncio.wait_for(run(), 30))
