"""Browser client: a single-file web app served next to the WebSocket port.

Parity with the reference's web stack (src/web/ WASM client + web/ TypeScript
app served to browsers over the WebSocket transport): here the server's
WebSocket listener also answers plain HTTP GETs with this page, which
connects back over RFC 6455, speaks ACIP (framing + capabilities), renders
ASCII_FRAME payloads into a <pre> via an SGR->span converter, and streams
webcam frames up as IMAGE_FRAMEs when the user grants camera access.
"""

INDEX_HTML = r"""<!DOCTYPE html>
<html>
<head>
<meta charset="utf-8">
<title>asciichat-tpu</title>
<style>
  body { background: #000; color: #ccc; font-family: monospace; margin: 0; }
  #frame { font-size: 12px; line-height: 1.0; white-space: pre; margin: 8px; }
  #bar { padding: 6px 8px; background: #111; }
  button { background: #222; color: #ccc; border: 1px solid #444; }
</style>
</head>
<body>
<div id="bar">
  <b>asciichat-tpu</b>
  <span id="status">connecting…</span>
  <button id="cam">share camera</button>
  <button id="aud">enable audio</button>
  <span id="fps"></span>
</div>
<div id="frame"></div>
<div id="chat" style="margin:8px; max-height:8em; overflow-y:auto; color:#9c9"></div>
<div id="chatbar" style="padding:6px 8px; background:#111">
  <input id="msg" placeholder="chat message…" style="background:#222;color:#ccc;border:1px solid #444;width:60%">
  <button id="send">send</button>
</div>
<script>
"use strict";
// ---- ACIP framing (net/packet.py wire format) ----
const MAGIC_HI = 0xA, MAGIC_LO = 0x5C11C4A1;  // 0xA5C11C4A1 as 36-bit
function crc32c(bytes) {
  let crc = 0xFFFFFFFF;
  for (let i = 0; i < bytes.length; i++) {
    crc ^= bytes[i];
    for (let j = 0; j < 8; j++)
      crc = (crc >>> 1) ^ (0x82F63B78 & -(crc & 1));
  }
  return (~crc) >>> 0;
}
function packPacket(type, payload) {
  const buf = new ArrayBuffer(22 + payload.length);
  const dv = new DataView(buf);
  dv.setUint32(0, 0x0000000A);           // magic high 32 bits of u64
  dv.setUint32(4, 0x5C11C4A1);           // magic low
  dv.setUint16(8, type);
  dv.setUint32(10, payload.length);
  dv.setUint32(14, payload.length ? crc32c(payload) : 0);
  dv.setUint32(18, 0);                   // client_id
  new Uint8Array(buf, 22).set(payload);
  return buf;
}
// ---- minimal ANSI SGR -> HTML ----
function ansiToHtml(text) {
  let out = "", fg = null, bg = null, open = false;
  const esc = /\x1b\[([0-9;]*)([a-zA-Z])/g;
  let last = 0, m;
  const span = () => {
    if (open) out += "</span>";
    open = false;
    if (fg || bg) {
      out += `<span style="${fg ? "color:" + fg + ";" : ""}${bg ? "background:" + bg : ""}">`;
      open = true;
    }
  };
  const emit = (s) => {
    out += s.replace(/&/g, "&amp;").replace(/</g, "&lt;");
  };
  while ((m = esc.exec(text)) !== null) {
    emit(text.slice(last, m.index));
    last = esc.lastIndex;
    const p = m[1].split(";").map(Number);
    if (m[2] === "m") {
      for (let i = 0; i < p.length; i++) {
        if (p[i] === 0 || m[1] === "") { fg = bg = null; }
        else if (p[i] === 38 && p[i+1] === 2) { fg = `rgb(${p[i+2]},${p[i+3]},${p[i+4]})`; i += 4; }
        else if (p[i] === 48 && p[i+1] === 2) { bg = `rgb(${p[i+2]},${p[i+3]},${p[i+4]})`; i += 4; }
        else if (p[i] === 38 && p[i+1] === 5) { fg = xterm256(p[i+2]); i += 2; }
        else if (p[i] === 48 && p[i+1] === 5) { bg = xterm256(p[i+2]); i += 2; }
        else if (p[i] >= 30 && p[i] <= 37) fg = xterm256(p[i] - 30);
        else if (p[i] >= 90 && p[i] <= 97) fg = xterm256(p[i] - 90 + 8);
        else if (p[i] >= 40 && p[i] <= 47) bg = xterm256(p[i] - 40);
        else if (p[i] >= 100 && p[i] <= 107) bg = xterm256(p[i] - 100 + 8);
      }
      span();
    } else if (m[2] === "b") {  // REP: repeat previous visible char
      const n = p[0] || 0;
      const prev = out.length ? out[out.length - 1] : " ";
      out += prev.repeat(n);
    }
  }
  emit(text.slice(last));
  if (open) out += "</span>";
  return out;
}
function xterm256(n) {
  const base = [[0,0,0],[128,0,0],[0,128,0],[128,128,0],[0,0,128],[128,0,128],
    [0,128,128],[192,192,192],[128,128,128],[255,0,0],[0,255,0],[255,255,0],
    [0,0,255],[255,0,255],[0,255,255],[255,255,255]];
  let r, g, b;
  if (n < 16) [r, g, b] = base[n];
  else if (n < 232) {
    const c = n - 16, lv = [0,95,135,175,215,255];
    r = lv[(c/36)|0]; g = lv[((c/6)|0)%6]; b = lv[c%6];
  } else { r = g = b = 8 + (n - 232) * 10; }
  return `rgb(${r},${g},${b})`;
}
// ---- capabilities payload (terminal_capabilities_packet_t, 168 bytes) ----
function capsPayload(cols, rows) {
  const buf = new ArrayBuffer(168);
  const dv = new DataView(buf);
  dv.setUint32(0, 1);         // capabilities mask: bit0 = no-compression (browser has no zstd)
  dv.setUint32(4, 3);         // TRUECOLOR
  dv.setUint32(8, 16777216);
  dv.setUint32(12, 2);        // HALF_BLOCK (good for browsers)
  dv.setUint16(16, cols);
  dv.setUint16(18, rows);
  const te = new TextEncoder().encode("xterm-web");
  new Uint8Array(buf, 20, Math.min(32, te.length)).set(te.subarray(0, 32));
  dv.setUint8(84, 1);         // detection_reliable
  dv.setUint32(85, 1);        // utf8
  dv.setUint32(89, 0);        // palette_type
  dv.setUint8(157, 60);       // desired fps
  dv.setUint8(158, 0);        // color filter
  dv.setUint8(159, 1);        // wants_padding
  return new Uint8Array(buf);
}
// ---- app ----
const dec = new TextDecoder();
const frameEl = document.getElementById("frame");
const statusEl = document.getElementById("status");
const fpsEl = document.getElementById("fps");
let frames = 0, t0 = performance.now();
const ws = new WebSocket(`ws://${location.host}/ws`);
ws.binaryType = "arraybuffer";
ws.onopen = () => {
  statusEl.textContent = "connected";
  const cols = Math.floor(window.innerWidth / 7.2);
  const rows = Math.floor((window.innerHeight - 40) / 12);
  ws.send(packPacket(5000, capsPayload(cols, rows)));
};
ws.onclose = () => statusEl.textContent = "disconnected";
ws.onmessage = (ev) => {
  const dv = new DataView(ev.data);
  const type = dv.getUint16(8);
  const len = dv.getUint32(10);
  const payload = new Uint8Array(ev.data, 22, len);
  if (type === 3000) {  // ASCII_FRAME
    const w = (payload[0]<<24)|(payload[1]<<16)|(payload[2]<<8)|payload[3];
    const compSize = (payload[12]<<24)|(payload[13]<<16)|(payload[14]<<8)|payload[15];
    if (compSize > 0) return;  // defensive: we advertise no-compression
    const body = payload.subarray(24);
    frameEl.innerHTML = ansiToHtml(dec.decode(body));
    frames++;
    const dt = (performance.now() - t0) / 1000;
    if (dt > 1) { fpsEl.textContent = ` ${(frames/dt).toFixed(1)} fps`; frames = 0; t0 = performance.now(); }
  } else if (type === 4000) {  // AUDIO_BATCH: exclude-self mix -> WebAudio
    playAudioBatch(payload);
  } else if (type === 2002) {  // TEXT_MESSAGE -> chat feed
    const line = document.createElement("div");
    line.textContent = "> " + dec.decode(payload.subarray(0, 500));
    const chat = document.getElementById("chat");
    chat.appendChild(line);
    while (chat.childNodes.length > 50) chat.removeChild(chat.firstChild);
    chat.scrollTop = chat.scrollHeight;
  }
};
// ---- text chat (TEXT_MESSAGE 2002, relayed by the server) ----
const msgEl = document.getElementById("msg");
function sendChat() {
  if (!msgEl.value || ws.readyState !== 1) return;
  ws.send(packPacket(2002, new TextEncoder().encode(msgEl.value.slice(0, 500))));
  msgEl.value = "";
}
document.getElementById("send").onclick = sendChat;
msgEl.addEventListener("keydown", (e) => { if (e.key === "Enter") sendChat(); });
// ---- live resize -> SIZE_MESSAGE (SIGWINCH analog) ----
let resizeTimer = null;
window.addEventListener("resize", () => {
  clearTimeout(resizeTimer);
  resizeTimer = setTimeout(() => {
    if (ws.readyState !== 1) return;
    const cols = Math.floor(window.innerWidth / 7.2);
    const rows = Math.floor((window.innerHeight - 80) / 12);
    const sz = new Uint8Array(4);
    new DataView(sz.buffer).setUint16(0, cols);
    new DataView(sz.buffer).setUint16(2, rows);
    ws.send(packPacket(2000, sz));
  }, 250);
});
// ---- WebAudio playback + mic uplink (src/client/audio.c in the browser) ----
let audioCtx = null, playCursor = 0;
function playAudioBatch(payload) {
  if (!audioCtx) return;  // needs the user-gesture opt-in
  const dv = new DataView(payload.buffer, payload.byteOffset, payload.byteLength);
  const total = dv.getUint32(4), rate = dv.getUint32(8) || 48000;
  const samples = new Float32Array(total);
  for (let i = 0; i < total; i++) samples[i] = dv.getFloat32(16 + i * 4, true);
  const buf = audioCtx.createBuffer(1, total, rate);
  buf.copyToChannel(samples, 0);
  const src = audioCtx.createBufferSource();
  src.buffer = buf;
  src.connect(audioCtx.destination);
  // schedule back-to-back: keep a small jitter cushion of 50ms
  playCursor = Math.max(playCursor, audioCtx.currentTime + 0.05);
  src.start(playCursor);
  playCursor += total / rate;
}
document.getElementById("aud").onclick = async () => {
  audioCtx = new (window.AudioContext || window.webkitAudioContext)({sampleRate: 48000});
  document.getElementById("aud").disabled = true;
  try {  // mic capture -> AUDIO_BATCH (f32le mono 48k, 10ms frames)
    const stream = await navigator.mediaDevices.getUserMedia({audio: true});
    const src = audioCtx.createMediaStreamSource(stream);
    const proc = audioCtx.createScriptProcessor(512, 1, 1);
    let pending = new Float32Array(0);
    proc.onaudioprocess = (e) => {
      const inp = e.inputBuffer.getChannelData(0);
      const merged = new Float32Array(pending.length + inp.length);
      merged.set(pending); merged.set(inp, pending.length);
      let at = 0;
      while (merged.length - at >= 480) {
        const hdr = new ArrayBuffer(16);
        const hv = new DataView(hdr);
        hv.setUint32(0, 1); hv.setUint32(4, 480); hv.setUint32(8, 48000); hv.setUint32(12, 1);
        const body = new Uint8Array(16 + 480 * 4);
        body.set(new Uint8Array(hdr));
        const bv = new DataView(body.buffer);
        for (let i = 0; i < 480; i++) bv.setFloat32(16 + i * 4, merged[at + i], true);
        if (ws.readyState === 1) ws.send(packPacket(4000, body));
        at += 480;
      }
      pending = merged.subarray(at);
    };
    src.connect(proc); proc.connect(audioCtx.destination);
  } catch (e) { /* no mic: playback-only */ }
};
// camera upload (IMAGE_FRAME, RGB24)
document.getElementById("cam").onclick = async () => {
  const stream = await navigator.mediaDevices.getUserMedia({video: {width: 320, height: 240}});
  const video = document.createElement("video");
  video.srcObject = stream; await video.play();
  const canvas = document.createElement("canvas");
  canvas.width = 320; canvas.height = 240;
  const ctx = canvas.getContext("2d");
  setInterval(() => {
    ctx.drawImage(video, 0, 0, 320, 240);
    const img = ctx.getImageData(0, 0, 320, 240).data;
    const rgb = new Uint8Array(320 * 240 * 3);
    for (let i = 0, j = 0; i < img.length; i += 4) {
      rgb[j++] = img[i]; rgb[j++] = img[i+1]; rgb[j++] = img[i+2];
    }
    const hdr = new ArrayBuffer(24);
    const hv = new DataView(hdr);
    hv.setUint32(0, 320); hv.setUint32(4, 240); hv.setUint32(8, 0);
    hv.setUint32(12, 0); hv.setUint32(16, crc32c(rgb)); hv.setUint32(20, Date.now() % 0xFFFFFFFF);
    const payload = new Uint8Array(24 + rgb.length);
    payload.set(new Uint8Array(hdr)); payload.set(rgb, 24);
    if (ws.readyState === 1) ws.send(packPacket(3001, payload));
  }, 66);
};
</script>
</body>
</html>
"""
