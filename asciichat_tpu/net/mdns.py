"""Minimal mDNS announce/discover for LAN server discovery (--mdns).

Parity with lib/network/mdns/{discovery,mdns}.c: the server announces
_asciichat._tcp.local on 224.0.0.251:5353 (PTR + SRV + TXT records); clients
query for the service type and collect responders. Dependency-free DNS
message encode/decode (only the record types mDNS service discovery needs).
"""

from __future__ import annotations

import dataclasses
import socket
import struct
import threading
import time

MDNS_GROUP = "224.0.0.251"
MDNS_PORT = 5353
SERVICE = "_asciichat._tcp.local"

TYPE_PTR, TYPE_TXT, TYPE_SRV, TYPE_A = 12, 16, 33, 1
CLASS_IN = 1


def _encode_name(name: str) -> bytes:
    out = b""
    for label in name.strip(".").split("."):
        raw = label.encode()
        out += bytes([len(raw)]) + raw
    return out + b"\0"


def _decode_name(buf: bytes, off: int) -> tuple[str, int]:
    labels = []
    jumps = 0
    pos = off
    end = None
    while True:
        if pos >= len(buf):
            break
        length = buf[pos]
        if length == 0:
            pos += 1
            break
        if length & 0xC0 == 0xC0:  # compression pointer
            ptr = struct.unpack(">H", buf[pos : pos + 2])[0] & 0x3FFF
            if end is None:
                end = pos + 2
            pos = ptr
            jumps += 1
            if jumps > 20:
                break
            continue
        labels.append(buf[pos + 1 : pos + 1 + length].decode(errors="replace"))
        pos += 1 + length
    return ".".join(labels), (end if end is not None else pos)


def build_announcement(instance: str, port: int, txt: dict[str, str],
                       address: str) -> bytes:
    """Unsolicited mDNS response: PTR + SRV + TXT + A."""
    full = f"{instance}.{SERVICE}"
    header = struct.pack(">HHHHHH", 0, 0x8400, 0, 4, 0, 0)  # QR=1 AA=1

    def record(name, rtype, rdata, ttl=120):
        return (_encode_name(name) + struct.pack(">HHIH", rtype, CLASS_IN | 0x8000, ttl, len(rdata))
                + rdata)

    ptr = record(SERVICE, TYPE_PTR, _encode_name(full))
    srv = record(full, TYPE_SRV,
                 struct.pack(">HHH", 0, 0, port) + _encode_name(f"{instance}.local"))
    txt_data = b"".join(
        bytes([len(f"{k}={v}")]) + f"{k}={v}".encode() for k, v in txt.items()
    ) or b"\0"
    txtr = record(full, TYPE_TXT, txt_data)
    a = record(f"{instance}.local", TYPE_A, socket.inet_aton(address))
    return header + ptr + srv + txtr + a


def build_query() -> bytes:
    header = struct.pack(">HHHHHH", 0, 0, 1, 0, 0, 0)
    return header + _encode_name(SERVICE) + struct.pack(">HH", TYPE_PTR, CLASS_IN)


@dataclasses.dataclass
class DiscoveredService:
    instance: str
    address: str
    port: int
    txt: dict[str, str]


def parse_response(buf: bytes, src_addr: str) -> DiscoveredService | None:
    try:
        _, flags, qd, an, ns, ar = struct.unpack(">HHHHHH", buf[:12])
        if not flags & 0x8000:
            return None
        off = 12
        for _ in range(qd):  # skip questions
            _, off = _decode_name(buf, off)
            off += 4
        instance = None
        port = None
        address = src_addr
        txt: dict[str, str] = {}
        for _ in range(an + ns + ar):
            name, off = _decode_name(buf, off)
            rtype, _cls, _ttl, rdlen = struct.unpack(">HHIH", buf[off : off + 10])
            off += 10
            rdata = buf[off : off + rdlen]
            if rtype == TYPE_PTR and name == SERVICE:
                target, _ = _decode_name(buf, off)
                instance = target.split(".")[0]
            elif rtype == TYPE_SRV:
                _, _, port = struct.unpack(">HHH", rdata[:6])
            elif rtype == TYPE_TXT:
                i = 0
                while i < len(rdata):
                    n = rdata[i]
                    entry = rdata[i + 1 : i + 1 + n].decode(errors="replace")
                    if "=" in entry:
                        k, v = entry.split("=", 1)
                        txt[k] = v
                    i += 1 + n
            elif rtype == TYPE_A and rdlen == 4:
                address = socket.inet_ntoa(rdata)
            off += rdlen
        if instance and port:
            return DiscoveredService(instance, address, port, txt)
    except (struct.error, IndexError):
        pass
    return None


def _mdns_socket() -> socket.socket:
    sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM, socket.IPPROTO_UDP)
    sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    sock.bind(("", MDNS_PORT))
    mreq = socket.inet_aton(MDNS_GROUP) + socket.inet_aton("0.0.0.0")
    sock.setsockopt(socket.IPPROTO_IP, socket.IP_ADD_MEMBERSHIP, mreq)
    sock.setsockopt(socket.IPPROTO_IP, socket.IP_MULTICAST_TTL, 255)
    return sock


class MdnsAnnouncer:
    """Server-side responder: announces on start + answers PTR queries."""

    def __init__(self, instance: str, port: int, txt: dict[str, str] | None = None,
                 address: str = "127.0.0.1"):
        self.announcement = build_announcement(instance, port, txt or {}, address)
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    def start(self) -> None:
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def _loop(self) -> None:
        try:
            sock = _mdns_socket()
        except OSError:
            return  # multicast unavailable (containers): silently disabled
        sock.settimeout(0.5)
        sock.sendto(self.announcement, (MDNS_GROUP, MDNS_PORT))
        while not self._stop.is_set():
            try:
                buf, addr = sock.recvfrom(4096)
            except socket.timeout:
                continue
            except OSError:
                return
            # answer PTR queries for our service type
            if len(buf) > 12 and not struct.unpack(">H", buf[2:4])[0] & 0x8000:
                name, _ = _decode_name(buf, 12)
                if name == SERVICE:
                    sock.sendto(self.announcement, (MDNS_GROUP, MDNS_PORT))
        sock.close()

    def stop(self) -> None:
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=1.0)


def discover(timeout: float = 2.0) -> list[DiscoveredService]:
    """Client-side one-shot discovery sweep."""
    try:
        sock = _mdns_socket()
    except OSError:
        return []
    sock.settimeout(0.3)
    sock.sendto(build_query(), (MDNS_GROUP, MDNS_PORT))
    found: dict[str, DiscoveredService] = {}
    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        try:
            buf, addr = sock.recvfrom(4096)
        except socket.timeout:
            continue
        except OSError:
            break
        svc = parse_response(buf, addr[0])
        if svc:
            found[svc.instance] = svc
    sock.close()
    return list(found.values())
