/* Micro-browser for executing web/app.js under the Qt5 QML V4 engine in CI
 * (tests/test_webclient.py). Everything the app touches is here: DOM
 * elements, timers (manually pumped, deterministic), WebSocket / fetch /
 * RTCPeerConnection / getUserMedia / AudioContext fakes, and a synchronous
 * Promise-like (SyncPromise) so the app's .then/.catch chains run to
 * completion inside one evaluate call — the V4 engine never drains real
 * promise reaction jobs (no event loop).
 *
 * Loaded AFTER the QJS_PRELUDE (TextEncoder/hex/unhex) and BEFORE
 * ansi.js/renderer.js/acip.js/app.js. The test drives the page via:
 *   __fire("DOMContentLoaded")   boot the app
 *   __pump(ms)                   advance the fake clock, run due timers
 *   __sockets[i]._open()/._recv(hex)/._drop()   WebSocket events
 *   __fetchResponder             programmable /webrtc/offer signaling
 */
"use strict";

// --- SyncPromise -----------------------------------------------------------
function SyncPromise(executor) {
  var self = this;
  this._state = 0; // 0 pending, 1 fulfilled, 2 rejected
  this._value = undefined;
  this._cbs = [];
  function settle(state, value) {
    if (self._state) return;
    if (state === 1 && value && typeof value.then === "function") {
      value.then(function (v) { settle(1, v); },
                 function (e) { settle(2, e); });
      return;
    }
    self._state = state;
    self._value = value;
    var cbs = self._cbs;
    self._cbs = [];
    for (var i = 0; i < cbs.length; i++) cbs[i]();
  }
  try {
    executor(function (v) { settle(1, v); }, function (e) { settle(2, e); });
  } catch (e) { settle(2, e); }
}
SyncPromise.prototype.then = function (onRes, onRej) {
  var self = this;
  return new SyncPromise(function (res, rej) {
    function run() {
      try {
        if (self._state === 1) res(onRes ? onRes(self._value) : self._value);
        else if (onRej) res(onRej(self._value));
        else rej(self._value);
      } catch (e) { rej(e); }
    }
    if (self._state) run(); else self._cbs.push(run);
  });
};
SyncPromise.prototype.catch = function (onRej) { return this.then(null, onRej); };
SyncPromise.resolve = function (v) { return new SyncPromise(function (res) { res(v); }); };
SyncPromise.reject = function (e) { return new SyncPromise(function (_res, rej) { rej(e); }); };

// --- clock + timers (deterministic, pumped by the test) ---------------------
var __now = 0;
var __timers = [];
var __timerSeq = 1;
var performance = { now: function () { return __now; } };
function setTimeout(fn, ms) {
  __timers.push({ id: __timerSeq, at: __now + (ms || 0), fn: fn, every: 0 });
  return __timerSeq++;
}
function setInterval(fn, ms) {
  __timers.push({ id: __timerSeq, at: __now + (ms || 0), fn: fn, every: ms || 1 });
  return __timerSeq++;
}
function clearTimeout(id) {
  for (var i = __timers.length - 1; i >= 0; i--)
    if (__timers[i].id === id) __timers.splice(i, 1);
}
var clearInterval = clearTimeout;
function requestAnimationFrame(cb) {
  return setTimeout(function () { cb(__now); }, 16);
}
function __pump(ms) {
  var end = __now + ms;
  for (;;) {
    var due = null;
    for (var i = 0; i < __timers.length; i++)
      if (__timers[i].at <= end && (due === null || __timers[i].at < due.at))
        due = __timers[i];
    if (due === null) break;
    __now = Math.max(__now, due.at);
    if (due.every) due.at = __now + due.every;
    else __timers.splice(__timers.indexOf(due), 1);
    due.fn();
  }
  __now = end;
}
function __timerDelays() { // pending one-shot delays, for backoff assertions
  var out = [];
  for (var i = 0; i < __timers.length; i++)
    if (!__timers[i].every) out.push(__timers[i].at - __now);
  return out;
}

// --- TextDecoder (UTF-8) ----------------------------------------------------
function TextDecoder() {}
TextDecoder.prototype.decode = function (u8) {
  var s = "", i = 0, n = u8.length;
  while (i < n) {
    var b = u8[i++], c;
    if (b < 0x80) c = b;
    else if (b < 0xe0) c = ((b & 31) << 6) | (u8[i++] & 63);
    else if (b < 0xf0)
      c = ((b & 15) << 12) | ((u8[i++] & 63) << 6) | (u8[i++] & 63);
    else
      c = ((b & 7) << 18) | ((u8[i++] & 63) << 12) |
          ((u8[i++] & 63) << 6) | (u8[i++] & 63);
    s += String.fromCodePoint(c);
  }
  return s;
};

// --- URLSearchParams --------------------------------------------------------
function URLSearchParams(s) {
  this._m = {};
  s = String(s || "").replace(/^\?/, "");
  if (!s) return;
  var parts = s.split("&");
  for (var i = 0; i < parts.length; i++) {
    var eq = parts[i].indexOf("=");
    if (eq < 0) this._m[decodeURIComponent(parts[i])] = "";
    else this._m[decodeURIComponent(parts[i].slice(0, eq))] =
      decodeURIComponent(parts[i].slice(eq + 1));
  }
}
URLSearchParams.prototype.get = function (k) {
  return Object.prototype.hasOwnProperty.call(this._m, k) ? this._m[k] : null;
};

// --- DOM --------------------------------------------------------------------
function Element(tag) {
  this.tagName = String(tag || "div").toUpperCase();
  this.textContent = "";
  this.className = "";
  this.value = "";
  this.disabled = false;
  this.childNodes = [];
  this.scrollTop = 0;
  this.scrollHeight = 0;
  this.clientWidth = 0;
  this.clientHeight = 0;
  this.style = {};
  this._listeners = {};
  var el = this;
  this.classList = {
    toggle: function (c) {
      var cs = el.className ? el.className.split(" ") : [];
      var i = cs.indexOf(c);
      if (i >= 0) cs.splice(i, 1); else cs.push(c);
      el.className = cs.join(" ");
      return i < 0;
    },
    contains: function (c) {
      return el.className.split(" ").indexOf(c) >= 0;
    },
  };
}
Element.prototype.appendChild = function (c) {
  this.childNodes.push(c);
  this.scrollHeight = this.childNodes.length * 16;
  return c;
};
Element.prototype.removeChild = function (c) {
  var i = this.childNodes.indexOf(c);
  if (i >= 0) this.childNodes.splice(i, 1);
  return c;
};
Element.prototype.addEventListener = function (t, fn) {
  (this._listeners[t] = this._listeners[t] || []).push(fn);
};
Element.prototype.dispatch = function (t, ev) {
  ev = ev || {};
  if (!ev.target) ev.target = this;
  var ls = (this._listeners[t] || []).slice();
  for (var i = 0; i < ls.length; i++) ls[i](ev);
  var h = this["on" + t];
  if (h) h(ev);
};
Object.defineProperty(Element.prototype, "firstChild", {
  get: function () { return this.childNodes.length ? this.childNodes[0] : null; },
});

function Ctx(canvas) {
  this.canvas = canvas;
  this.ops = [];
  this.font = ""; this.fillStyle = ""; this.textBaseline = "";
  this.imageSmoothingEnabled = true;
}
Ctx.prototype.measureText = function (s) { return { width: 8 }; };
Ctx.prototype.createImageData = function (w, h) {
  return { width: w, height: h, data: new Uint8ClampedArray(w * h * 4) };
};
Ctx.prototype.putImageData = function (img, x, y) {
  this.canvas._img = img;
  this.ops.push(["put", img.width, img.height]);
};
Ctx.prototype.drawImage = function (src, x, y, w, h) {
  this.ops.push(["drawImage", w, h]);
};
Ctx.prototype.fillRect = function (x, y, w, h) {
  this.ops.push(["rect", x, y, w, h, this.fillStyle]);
};
Ctx.prototype.fillText = function (s, x, y) {
  this.ops.push(["text", s, x, y, this.fillStyle]);
};
Ctx.prototype.getImageData = function (x, y, w, h) {
  // camera uplink reads back what drawImage painted; a deterministic
  // gradient stands in for real video pixels
  var d = new Uint8ClampedArray(w * h * 4);
  for (var i = 0, px = 0; i < d.length; i += 4, px++) {
    d[i] = px & 255; d[i + 1] = (px >> 8) & 255; d[i + 2] = 7; d[i + 3] = 255;
  }
  return { width: w, height: h, data: d };
};

function Canvas() {
  Element.call(this, "canvas");
  this.width = 0;
  this.height = 0;
  this._ctx = null;
}
Canvas.prototype = Object.create(Element.prototype);
Canvas.prototype.getContext = function () {
  if (!this._ctx) this._ctx = new Ctx(this);
  return this._ctx;
};

function Video() {
  Element.call(this, "video");
  this.srcObject = null;
}
Video.prototype = Object.create(Element.prototype);
Video.prototype.play = function () { return SyncPromise.resolve(); };

var document = {
  _els: {},
  title: "",
  _listeners: {},
  getElementById: function (id) {
    if (!this._els[id]) {
      var el = id === "screen" ? new Canvas() : new Element("div");
      if (id === "stage") { el.clientWidth = 203 * 8; el.clientHeight = 64 * 17; }
      if (id === "msg") el.tagName = "INPUT";
      if (id === "camres") el.value = "320x240";
      this._els[id] = el;
    }
    return this._els[id];
  },
  createElement: function (tag) {
    if (tag === "canvas") return new Canvas();
    if (tag === "video") return new Video();
    return new Element(tag);
  },
  addEventListener: Element.prototype.addEventListener,
  dispatch: Element.prototype.dispatch,
};

// --- window / location / navigator ------------------------------------------
var location = { host: "srv.test:27226", search: "" };
var __winListeners = {};
var window = globalThis;
window.addEventListener = function (t, fn) {
  (__winListeners[t] = __winListeners[t] || []).push(fn);
};
function __fire(t, ev) {
  var ls = (__winListeners[t] || []).slice();
  for (var i = 0; i < ls.length; i++) ls[i](ev || {});
}

var __gumResult = null; // set to {} (fake stream) to grant device access
var navigator = {
  mediaDevices: {
    getUserMedia: function (constraints) {
      return __gumResult !== null
        ? SyncPromise.resolve(__gumResult)
        : SyncPromise.reject(new Error("no media device"));
    },
  },
};

// --- WebSocket fake -----------------------------------------------------------
var __sockets = [];
function WebSocket(url) {
  this.url = url;
  this.readyState = 0;
  this.binaryType = "";
  this.sent = [];
  this.onopen = null; this.onclose = null;
  this.onerror = null; this.onmessage = null;
  __sockets.push(this);
}
WebSocket.prototype.send = function (buf) {
  this.sent.push(hex(new Uint8Array(buf)));
};
WebSocket.prototype.close = function () {
  this.readyState = 3;
  if (this.onclose) this.onclose();
};
WebSocket.prototype._open = function () {
  this.readyState = 1;
  if (this.onopen) this.onopen();
};
WebSocket.prototype._drop = function () { // server-side close / network death
  this.readyState = 3;
  if (this.onclose) this.onclose();
};
WebSocket.prototype._recv = function (hexstr) { // binary frame from server
  if (this.onmessage) this.onmessage({ data: unhex(hexstr).buffer });
};
WebSocket.prototype._recvText = function (s) { // rogue text frame
  if (this.onmessage) this.onmessage({ data: s });
};

// --- fetch + RTCPeerConnection fakes ----------------------------------------
var __fetchCalls = [];
var __fetchResponder = null; // function(url, opts) -> {ok, status, text}
function fetch(url, opts) {
  __fetchCalls.push({ url: url, body: opts && opts.body });
  if (!__fetchResponder)
    return SyncPromise.reject(new Error("network unreachable"));
  var r = __fetchResponder(url, opts);
  return SyncPromise.resolve({
    ok: !!r.ok,
    status: r.status || (r.ok ? 200 : 500),
    text: function () { return SyncPromise.resolve(r.text || ""); },
  });
}

var __pcs = [];
function RTCDataChannel(label) {
  this.label = label;
  this.readyState = "connecting";
  this.binaryType = "";
  this.sent = [];
  this.onopen = null; this.onclose = null; this.onmessage = null;
}
RTCDataChannel.prototype.send = function (buf) {
  this.sent.push(hex(new Uint8Array(buf)));
};
RTCDataChannel.prototype.close = function () { this.readyState = "closed"; };
RTCDataChannel.prototype._open = function () {
  this.readyState = "open";
  if (this.onopen) this.onopen();
};
RTCDataChannel.prototype._recv = function (hexstr) {
  if (this.onmessage) this.onmessage({ data: unhex(hexstr).buffer });
};
function RTCPeerConnection() {
  this.iceGatheringState = "complete"; // non-trickle offers gather eagerly
  this.localDescription = null;
  this.remoteDescription = null;
  this.onicegatheringstatechange = null;
  this._dc = null;
  this._closed = false;
  __pcs.push(this);
}
RTCPeerConnection.prototype.createDataChannel = function (label) {
  this._dc = new RTCDataChannel(label);
  return this._dc;
};
RTCPeerConnection.prototype.createOffer = function () {
  return SyncPromise.resolve({ type: "offer", sdp: "v=0 fake-offer" });
};
RTCPeerConnection.prototype.setLocalDescription = function (d) {
  this.localDescription = d;
  return SyncPromise.resolve();
};
RTCPeerConnection.prototype.setRemoteDescription = function (d) {
  this.remoteDescription = d;
  return SyncPromise.resolve();
};
RTCPeerConnection.prototype.close = function () {
  // real browsers fire the channel's close asynchronously
  this._closed = true;
  var dc = this._dc;
  if (dc && dc.readyState !== "closed")
    setTimeout(function () {
      dc.readyState = "closed";
      if (dc.onclose) dc.onclose();
    }, 0);
};

// --- AudioContext fake --------------------------------------------------------
function AudioContext(opts) {
  this.sampleRate = (opts && opts.sampleRate) || 44100;
  this.currentTime = 0;
  this.destination = { connect: function () {} };
  this._played = []; // {length, rate, at}
  this._procs = [];
  AudioContext._last = this;
}
AudioContext.prototype.createBuffer = function (ch, len, rate) {
  return {
    length: len, rate: rate, _data: null,
    copyToChannel: function (samples) { this._data = samples; },
  };
};
AudioContext.prototype.createBufferSource = function () {
  var ctx = this;
  return {
    buffer: null,
    connect: function () {},
    start: function (at) {
      ctx._played.push({ length: this.buffer.length, rate: this.buffer.rate, at: at });
    },
  };
};
AudioContext.prototype.createMediaStreamSource = function () {
  return { connect: function () {} };
};
AudioContext.prototype.createScriptProcessor = function (size) {
  var proc = { onaudioprocess: null, connect: function () {}, _size: size };
  this._procs.push(proc);
  return proc;
};
