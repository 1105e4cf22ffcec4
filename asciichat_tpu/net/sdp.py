"""SDP offer/answer for WebRTC DataChannel signaling (RFC 8866 + 8839/8841).

The reference's browsers negotiate DataChannels with standard SDP through
the signaling server (lib/network/webrtc/sdp.c builds/parses the same
m=application sections via libdatachannel). This module is the text codec
between a browser's RTCPeerConnection SDP and this framework's internal
signaling-blob shape (net/webrtc.IceLiteAgent.local_description):

  browser offer --parse()--> desc dict --IceLiteAgent.set_remote
  IceLiteAgent  --answer_for_agent()--> SDP answer text --> browser

Only the application/webrtc-datachannel section matters (no media m-lines);
unknown attributes are ignored on parse, per SDP convention.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

# fixed session-level id; SDP requires o= but nothing consumes it here
_O_LINE = "o=- 4611686018427387904 2 IN IP4 127.0.0.1"


@dataclass
class SdpInfo:
    """The subset of an SDP that a DataChannel association needs."""

    ufrag: str = ""
    pwd: str = ""
    fingerprint: str = ""  # "AB:CD:..." (sha-256)
    setup: str = "actpass"  # actpass | active | passive
    mid: str = "0"
    sctp_port: int = 5000
    max_message_size: int = 262144
    ice_lite: bool = False
    candidates: list[dict] = field(default_factory=list)  # {ip, port, type}

    def to_desc(self) -> dict:
        """The internal signaling-blob shape (webrtc.set_remote input)."""
        return {
            "ufrag": self.ufrag,
            "pwd": self.pwd,
            "dtls_fp": self.fingerprint,
            "candidates": [dict(c) for c in self.candidates],
            "setup": self.setup,
            "sctp_port": self.sctp_port,
        }


def parse(sdp: str) -> SdpInfo:
    """Parse the attributes this stack needs from an offer/answer. Tolerates
    session-level vs media-level placement (browsers put ice/fingerprint at
    either) and ignores everything it doesn't know."""
    info = SdpInfo()
    for raw in sdp.replace("\r\n", "\n").split("\n"):
        line = raw.strip()
        if line.startswith("a=ice-ufrag:"):
            info.ufrag = line.split(":", 1)[1]
        elif line.startswith("a=ice-pwd:"):
            info.pwd = line.split(":", 1)[1]
        elif line == "a=ice-lite":
            info.ice_lite = True
        elif line.startswith("a=fingerprint:"):
            algo_fp = line.split(":", 1)[1].split(None, 1)
            if len(algo_fp) == 2 and algo_fp[0].lower() == "sha-256":
                info.fingerprint = algo_fp[1].strip().upper()
        elif line.startswith("a=setup:"):
            info.setup = line.split(":", 1)[1]
        elif line.startswith("a=mid:"):
            info.mid = line.split(":", 1)[1]
        elif line.startswith("a=sctp-port:"):
            info.sctp_port = int(line.split(":", 1)[1])
        elif line.startswith("a=max-message-size:"):
            info.max_message_size = int(line.split(":", 1)[1])
        elif line.startswith("a=candidate:"):
            cand = _parse_candidate(line[len("a=candidate:"):])
            if cand is not None:
                info.candidates.append(cand)
    return info


def parse_candidate_line(line: str) -> dict | None:
    """One trickled candidate (RFC 8838): accepts the wire shapes browsers
    emit — a full ``a=candidate:...`` SDP line, the JSEP ``candidate:...``
    RTCIceCandidate.candidate string, or the bare attribute value. Returns
    the internal {ip, port, type} dict or None for end-of-candidates /
    unusable (TCP, IPv6/mDNS) candidates."""
    line = line.strip()
    for prefix in ("a=candidate:", "candidate:"):
        if line.startswith(prefix):
            return _parse_candidate(line[len(prefix):])
    if line and not line.startswith("a=end-of-candidates"):
        return _parse_candidate(line)
    return None


def _parse_candidate(value: str) -> dict | None:
    """candidate-attribute (RFC 8839 §5.1): foundation component transport
    priority address port 'typ' type ..."""
    parts = value.split()
    if len(parts) < 8 or parts[2].lower() != "udp":
        return None  # TCP candidates are not used by this stack
    try:
        ip, port = parts[4], int(parts[5])
    except ValueError:
        return None
    typ = parts[7] if parts[6] == "typ" else "host"
    if not re.fullmatch(r"[0-9.]+", ip):
        return None  # IPv6/mDNS (.local) candidates: not resolvable here
    return {"ip": ip, "port": port, "type": typ}


def _format_candidates(cands: list[dict]) -> list[str]:
    lines = []
    for i, c in enumerate(cands):
        typ = c.get("type", "host")
        # priority: host above srflx, both below whatever the browser has
        prio = 2130706431 - i if typ == "host" else 1694498815 - i
        lines.append(
            f"a=candidate:{i} 1 udp {prio} {c['ip']} {c['port']} typ {typ}"
        )
    return lines


def build(desc: dict, *, setup: str, ice_lite: bool,
          sctp_port: int = 5000, mid: str = "0") -> str:
    """SDP text from an internal signaling blob (agent.local_description()).
    `setup` is the DTLS role offer/answer: 'actpass' in offers, 'passive'
    or 'active' in answers (RFC 8842). `mid` must ECHO the offer's mid in
    an answer (JSEP; browsers reject a mismatched mid)."""
    lines = [
        "v=0",
        _O_LINE,
        "s=-",
        "t=0 0",
    ]
    if ice_lite:
        lines.append("a=ice-lite")
    lines += [
        f"a=group:BUNDLE {mid}",
        "a=msid-semantic: WMS",
        "m=application 9 UDP/DTLS/SCTP webrtc-datachannel",
        "c=IN IP4 0.0.0.0",
        f"a=ice-ufrag:{desc['ufrag']}",
        f"a=ice-pwd:{desc['pwd']}",
        f"a=fingerprint:sha-256 {desc['dtls_fp']}",
        f"a=setup:{setup}",
        f"a=mid:{mid}",
        f"a=sctp-port:{sctp_port}",
        "a=max-message-size:262144",
    ]
    lines += _format_candidates(desc.get("candidates", []))
    return "\r\n".join(lines) + "\r\n"


def answer_for_agent(agent, offer: "SdpInfo | None" = None, *,
                     public_ip: str | None = None) -> str:
    """SDP answer for a browser's offer, from an ICE-lite controlled agent
    (the server role: a=ice-lite + a=setup:passive, the browser takes the
    active/DTLS-client side; RFC 8839 §4.3, RFC 8842 §5.3). The answer
    echoes the offer's mid — JSEP requires the m-section identification
    to match or setRemoteDescription rejects."""
    desc = agent.local_description()
    if public_ip:
        port = agent.local_port
        cands = [c for c in desc["candidates"] if c["ip"] != "127.0.0.1"]
        if not any(c["ip"] == public_ip for c in cands):
            cands.append({"ip": public_ip, "port": port, "type": "host"})
        desc["candidates"] = cands
    return build(desc, setup="passive", ice_lite=True,
                 mid=offer.mid if offer else "0")


def offer_for_agent(agent) -> str:
    """SDP offer from a controlling agent (the browser-role side; used by
    tests and by native clients dialing a WebRTC-only listener)."""
    return build(agent.local_description(), setup="actpass", ice_lite=False)
