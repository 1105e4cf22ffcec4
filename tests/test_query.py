"""ascii-query: attach-to-live-PID inspection of a HUNG process
(src/tooling/query/main.cpp role — no debugger on this box, so /proc +
the ambient SIGUSR1 faulthandler channel stand in for LLDB attach)."""

import json
import subprocess
import sys
import textwrap
import time
import urllib.error
import urllib.request

import pytest

CHILD = textwrap.dedent("""
    import threading, time
    from asciichat_tpu.utils.dumps import install_dump_handlers
    install_dump_handlers()  # the ambient channel every asciichat mode has

    a, b = threading.Lock(), threading.Lock()
    def grab_ab():
        with a:
            time.sleep(0.2)
            with b:
                pass
    def grab_ba():
        with b:
            time.sleep(0.2)
            with a:
                pass
    t1 = threading.Thread(target=grab_ab, name="ab")
    t2 = threading.Thread(target=grab_ba, name="ba")
    t1.start(); t2.start()
    print("DEADLOCKED", flush=True)
    t1.join(); t2.join()  # never returns: full GIL-level deadlock
""")


@pytest.fixture
def hung_child():
    proc = subprocess.Popen([sys.executable, "-c", CHILD],
                            stdout=subprocess.PIPE)
    assert proc.stdout.readline().strip() == b"DEADLOCKED"
    time.sleep(0.4)  # let both threads reach the deadlock
    yield proc
    proc.kill()
    proc.wait()


def test_query_attaches_to_deadlocked_process(hung_child):
    """One-shot attach via the REAL CLI: Python stacks show the deadlocked
    functions even though every thread is blocked on a lock, plus
    kernel-side status/fds — against a process started WITHOUT any
    inspector flag."""
    pid = hung_child.pid
    out = subprocess.run(
        [sys.executable, "-m", "asciichat_tpu.apps.main", "query", str(pid)],
        capture_output=True, timeout=60, check=True)
    report = json.loads(out.stdout)

    # Python stacks out of a fully deadlocked process
    assert "grab_ab" in report["pystacks"], report["pystacks"][:500]
    assert "grab_ba" in report["pystacks"]
    # kernel-side: process alive and multi-threaded
    assert int(report["status"]["Threads"]) >= 3
    assert report["status"]["cmdline"]
    assert report["fds"]  # open fd table readable
    assert report["kstacks"]  # one entry per task (content kernel-dependent)


def test_query_http_surface(hung_child):
    """--serve mode: the query-server HTTP shape (/status, /pystacks)."""
    from asciichat_tpu.apps import query

    httpd = query.serve(hung_child.pid, 0)
    import threading

    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    port = httpd.server_address[1]
    try:
        st = json.loads(urllib.request.urlopen(
            f"http://127.0.0.1:{port}/status", timeout=10).read())
        assert st["pid"] == hung_child.pid
        py = json.loads(urllib.request.urlopen(
            f"http://127.0.0.1:{port}/pystacks", timeout=30).read())
        assert "grab_ab" in py["dump"]
        with pytest.raises(urllib.error.HTTPError):
            urllib.request.urlopen(f"http://127.0.0.1:{port}/nope", timeout=10)
    finally:
        httpd.shutdown()


def test_query_missing_pid():
    from asciichat_tpu.apps import query

    class A:
        pid = 2 ** 22 + 12345  # beyond pid_max default
        serve = None

    assert query.main(A()) == 1


def test_python_stacks_never_kills_unregistered_process():
    """SIGUSR1's default disposition is Term: ascii-query must NOT signal
    a process that has no handler installed (non-asciichat pid, or the
    best-effort registration failed) — doing so would kill the very
    process it was asked to inspect."""
    import os
    import signal
    import subprocess
    import sys
    import time

    from asciichat_tpu.apps.query import _catches_sigusr1, python_stacks

    # a plain python child that does NOT install any SIGUSR1 handler
    child = subprocess.Popen([sys.executable, "-c", "import time; time.sleep(30)"])
    try:
        time.sleep(0.5)
        assert not _catches_sigusr1(child.pid)
        out = python_stacks(child.pid, timeout=1.0)
        assert out == ""
        time.sleep(0.3)
        assert child.poll() is None, "query KILLED the uninspectable target"
        # and one that DOES register a handler is correctly detected
        h = subprocess.Popen([sys.executable, "-c",
                              "import signal, time;"
                              "signal.signal(signal.SIGUSR1, lambda *a: None);"
                              "print('R', flush=True);"
                              "time.sleep(30)"], stdout=subprocess.PIPE)
        try:
            assert h.stdout.read(1) == b"R"  # handler installed
            assert _catches_sigusr1(h.pid)
        finally:
            h.kill()
            h.wait()
    finally:
        child.kill()
        child.wait()


def test_dump_file_mode_tightened_on_reuse(monkeypatch, tmp_path):
    """A pre-existing same-uid dump file with a permissive mode (written by
    an old version under a default umask) must be fchmod'd back to 0600 —
    the O_CREAT mode only applies at creation, and thread stacks are
    private."""
    import os
    import stat

    from asciichat_tpu.utils import dumps

    monkeypatch.setattr(dumps.tempfile, "gettempdir", lambda: str(tmp_path))
    p = dumps.dump_path()
    with open(p, "w") as fh:
        fh.write("old dump\n")
    os.chmod(p, 0o644)
    f = dumps.install_dump_handlers()
    assert f is not None
    try:
        assert stat.S_IMODE(os.stat(p).st_mode) == 0o600
    finally:
        import faulthandler
        import signal

        faulthandler.unregister(signal.SIGUSR1)
        f.close()


def test_dump_channel_refuses_foreign_file(monkeypatch, tmp_path):
    """A same-name file planted by a different uid gets no dump channel."""
    import os

    import pytest as _pytest

    if os.getuid() != 0:
        _pytest.skip("needs root to chown a foreign-uid file")

    from asciichat_tpu.utils import dumps

    monkeypatch.setattr(dumps.tempfile, "gettempdir", lambda: str(tmp_path))
    p = dumps.dump_path()
    with open(p, "w") as fh:
        fh.write("planted\n")
    os.chown(p, 12345, 12345)
    assert dumps.install_dump_handlers() is None
