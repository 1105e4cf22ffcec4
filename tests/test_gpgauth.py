"""GPG identity auth (lib/crypto/gpg analog): detach-sign the DH-bound
challenge, server verifies against an allowed-keys keyring via the gpg CLI."""

import asyncio
import os
import shutil
import subprocess

import pytest

pytestmark = pytest.mark.skipif(shutil.which("gpg") is None,
                                reason="no gpg on PATH")


@pytest.fixture(scope="module")
def gpg_homes(tmp_path_factory):
    """Two keyrings: the client's (with a secret key) and the server's
    allowed-keys keyring (public key imported)."""
    client_home = str(tmp_path_factory.mktemp("gpg_client"))
    server_home = str(tmp_path_factory.mktemp("gpg_server"))
    evil_home = str(tmp_path_factory.mktemp("gpg_evil"))
    os.chmod(client_home, 0o700)
    os.chmod(server_home, 0o700)
    os.chmod(evil_home, 0o700)

    def gen(home, uid):
        subprocess.run(
            ["gpg", "--batch", "--quick-gen-key", "--passphrase", "",
             "--pinentry-mode", "loopback", uid, "ed25519", "sign", "0"],
            env={**os.environ, "GNUPGHOME": home},
            check=True, capture_output=True)

    gen(client_home, "good@asciichat")
    gen(evil_home, "evil@asciichat")
    # export the good public key into the server's allowed keyring
    pub = subprocess.run(["gpg", "--export", "good@asciichat"],
                         env={**os.environ, "GNUPGHOME": client_home},
                         check=True, capture_output=True).stdout
    subprocess.run(["gpg", "--import"],
                   env={**os.environ, "GNUPGHOME": server_home},
                   input=pub, check=True, capture_output=True)
    return client_home, server_home, evil_home


def test_gpg_sign_and_keyring_verify(gpg_homes):
    from asciichat_tpu.net import gpgauth

    client_home, server_home, evil_home = gpg_homes
    ident = gpgauth.GpgIdentity(gnupghome=client_home)
    keyring = gpgauth.GpgKeyring(server_home)
    chal, shared = os.urandom(32), os.urandom(32)
    resp = gpgauth.make_auth_response(ident, chal, shared)
    assert gpgauth.verify_auth_response(resp, chal, shared, keyring)
    # DH binding: different shared key -> reject
    assert not gpgauth.verify_auth_response(resp, chal, os.urandom(32), keyring)
    # a key NOT in the server keyring is rejected even with a valid signature
    evil = gpgauth.GpgIdentity(gnupghome=evil_home)
    evil_resp = gpgauth.make_auth_response(evil, chal, shared)
    assert not gpgauth.verify_auth_response(evil_resp, chal, shared, keyring)
    # tampered payload
    bad = bytearray(resp)
    bad[-1] ^= 0xFF
    assert not gpgauth.verify_auth_response(bytes(bad), chal, shared, keyring)


def test_gpg_handshake_over_socket(gpg_homes):
    from asciichat_tpu.net import gpgauth
    from asciichat_tpu.net.crypto import CryptoContext
    from asciichat_tpu.net.handshake import (
        HandshakeError, client_handshake, server_handshake,
    )
    from asciichat_tpu.net.transport import Transport, connect_tcp

    client_home, server_home, evil_home = gpg_homes
    keyring = gpgauth.GpgKeyring(server_home)

    async def run():
        results = {}

        async def on_server(t: Transport):
            ctx = CryptoContext()
            first = await t.recv()
            try:
                results["ok"] = await server_handshake(
                    t, ctx, first, gpg_keyring=keyring)
            except HandshakeError as e:
                results["err"] = str(e)

        server = await asyncio.start_server(
            lambda r, w: on_server(Transport(r, w)), "127.0.0.1", 0)
        port = server.sockets[0].getsockname()[1]

        t = await connect_tcp("127.0.0.1", port)
        good = gpgauth.GpgIdentity(gnupghome=client_home)
        assert await client_handshake(t, CryptoContext(), gpg_identity=good)
        await t.close()
        await asyncio.sleep(0.2)
        assert results.pop("ok") is True

        t = await connect_tcp("127.0.0.1", port)
        evil = gpgauth.GpgIdentity(gnupghome=evil_home)
        with pytest.raises(Exception):
            await client_handshake(t, CryptoContext(), gpg_identity=evil)
        await t.close()
        await asyncio.sleep(0.2)
        assert "authentication" in results.pop("err", "")
        server.close()

    asyncio.run(asyncio.wait_for(run(), 60))
