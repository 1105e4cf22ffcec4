"""Discovery mode: P2P sessions with automatic host negotiation.

Parity with src/discovery/ + src/common/session/{host,participant}.c: the
first participant creates a session on the ACDS and HOSTS the chat server
locally; joiners look the session up by its word-string and connect to the
designated host. Participants report NETWORK_QUALITY metrics; when ACDS
broadcasts HOST_DESIGNATED with a new host (election or failover),
participants migrate by reconnecting to the new address.
"""

from __future__ import annotations

import asyncio
import json
import secrets

from asciichat_tpu.net import consensus as cons
from asciichat_tpu.net import packet as pkt
from asciichat_tpu.net.transport import connect_tcp
from asciichat_tpu.utils.logsys import get_logger

log = get_logger("discovery")

QUALITY_REPORT_INTERVAL_S = 30.0


class DiscoverySession:
    """ACDS-side participation: register, report metrics, track the host."""

    def __init__(self, acds_host: str, acds_port: int,
                 participant_id: str | None = None):
        self.acds_host = acds_host
        self.acds_port = acds_port
        self.participant_id = participant_id or secrets.token_hex(8)
        self.session_string: str | None = None
        self.host_id: str | None = None
        self.host_address: str | None = None
        self.host_port: int | None = None
        self.participants: list[str] = []
        self.on_host_changed = None  # callback(address, port)
        self._t = None

    async def connect(self) -> None:
        self._t = await connect_tcp(self.acds_host, self.acds_port)

    async def create(self, my_port: int, my_address: str = "127.0.0.1",
                     reserved_string: str | None = None) -> str:
        await self._t.send(pkt.PacketType.ACIP_SESSION_CREATE, json.dumps({
            "participant_id": self.participant_id,
            "address": my_address,
            "port": my_port,
            "reserved_string": reserved_string,
        }).encode())
        ptype, payload = await self._t.recv()
        resp = json.loads(payload)
        if ptype == pkt.PacketType.ERROR_MESSAGE:
            raise RuntimeError(resp.get("error", "session create failed"))
        self.session_string = resp["session_string"]
        self.host_id = self.participant_id
        self.host_address, self.host_port = my_address, my_port
        return self.session_string

    async def join(self, session_string: str, my_address: str = "",
                   my_port: int = 0) -> tuple[str, int]:
        await self._t.send(pkt.PacketType.ACIP_SESSION_JOIN, json.dumps({
            "participant_id": self.participant_id,
            "session_string": session_string,
            "address": my_address,
            "port": my_port,
        }).encode())
        while True:
            ptype, payload = await self._t.recv()
            if ptype == pkt.PacketType.ERROR_MESSAGE:
                raise RuntimeError(json.loads(payload).get("error"))
            if ptype == pkt.PacketType.ACIP_SESSION_JOINED:
                resp = json.loads(payload)
                self.session_string = session_string
                self.host_id = resp["host_id"]
                self.host_address = resp["host_address"]
                self.host_port = resp["host_port"]
                return self.host_address, self.host_port
            # PARTICIPANT_LIST etc. may arrive first; keep reading

    def metrics(self) -> cons.ParticipantMetrics:
        return cons.ParticipantMetrics(
            participant_id=self.participant_id,
            nat_tier=1, upload_kbps=10_000, rtt_ms=20, stun_success_pct=100,
            address=self.host_address or "127.0.0.1",
            port=self.host_port or 0,
        )

    async def event_loop(self) -> None:
        """Track participant lists + host designations; report quality."""
        P = pkt.PacketType

        async def report():
            while True:
                self._t.send_nowait(P.ACIP_NETWORK_QUALITY, self.metrics().pack())
                await asyncio.sleep(QUALITY_REPORT_INTERVAL_S)

        reporter = asyncio.create_task(report())
        try:
            while True:
                ptype, payload = await self._t.recv()
                if ptype == P.ACIP_PARTICIPANT_LIST:
                    info = json.loads(payload)
                    self.participants = info["participants"]
                elif ptype == P.ACIP_HOST_DESIGNATED:
                    info = json.loads(payload)
                    if info["host_id"] != self.host_id:
                        self.host_id = info["host_id"]
                        self.host_address = info["host_address"]
                        self.host_port = info["host_port"]
                        log.info("host migrated to %s (%s:%d)", self.host_id,
                                 self.host_address, self.host_port)
                        if self.on_host_changed:
                            self.on_host_changed(self.host_address, self.host_port)
        finally:
            reporter.cancel()

    async def leave(self) -> None:
        if self._t and self.session_string:
            await self._t.send(pkt.PacketType.ACIP_SESSION_LEAVE, b"{}")
            await self._t.close()


async def run_discovery(args) -> int:
    from asciichat_tpu.apps.server import AsciiChatServer

    sess = DiscoverySession(args.acds, args.acds_port)
    await sess.connect()
    if args.join:
        host, port = await sess.join(args.join)
        log.info("joined %s -> host at %s:%d", args.join, host, port)
        print(f"session: {args.join}\nhost: {host}:{port}", flush=True)
        events = asyncio.create_task(sess.event_loop())
        from asciichat_tpu.apps.client import AsciiChatClient
        from asciichat_tpu.net import protocol as proto
        from asciichat_tpu.runtime.framesource import open_source
        from asciichat_tpu.utils import term

        caps = term.detect_capabilities()
        w, h = term.terminal_size(args.width, args.height)
        client = AsciiChatClient(
            host, port, open_source(test_pattern=True),
            proto.WireCapabilities(caps=caps, width=w, height=h),
        )
        try:
            await client.run(max_frames=args.max_frames)
        finally:
            events.cancel()
            await sess.leave()
        return 0

    # create + host
    port = args.port
    session_string = await sess.create(port, my_address=args.advertise)
    print(f"session: {session_string}", flush=True)
    log.info("hosting session %s on port %d", session_string, port)
    events = asyncio.create_task(sess.event_loop())
    server = AsciiChatServer("0.0.0.0", port)
    try:
        await server.run()
    finally:
        events.cancel()
        await sess.leave()
    return 0


def main(args) -> int:
    try:
        return asyncio.run(run_discovery(args))
    except KeyboardInterrupt:
        return 0
