"""Runtime control channel (runtime/control.py): the live-mode equivalent
of the reference node's ~reset_white_balance service + dynamic reconfigure
(raw_image_pipeline_ros.cpp:290-295)."""

import socket
import threading
import time

import numpy as np

from raw_image_pipeline_tpu.runtime.control import ControlServer, send_command


def test_control_server_dispatch():
    calls = []
    srv = ControlServer({
        "reset_white_balance": lambda: calls.append("reset"),
        "reload_params": lambda *a: calls.append(("reload",) + a) or "params reloaded",
        "boom": lambda: (_ for _ in ()).throw(RuntimeError("kaput")),
    })
    try:
        assert send_command(srv.address, "reset_white_balance") == "ok"
        assert send_command(srv.address, "reload_params /tmp/x.yaml") == \
            "ok params reloaded"
        assert send_command(srv.address, "boom") == "err kaput"
        reply = send_command(srv.address, "nope")
        assert reply.startswith("err unknown command 'nope'")
        assert "reset_white_balance" in reply
    finally:
        srv.close()
    assert calls == ["reset", ("reload", "/tmp/x.yaml")]


def test_control_server_multiple_clients():
    """A parked controller must not block another client's command."""
    srv = ControlServer({"ping": lambda: "pong"})
    parked = socket.create_connection(srv.address)  # connects, sends nothing
    try:
        assert send_command(srv.address, "ping") == "ok pong"
    finally:
        parked.close()
        srv.close()


def test_run_pipeline_listen_with_control(tmp_path):
    """End-to-end: --listen + --control resets the WB temporal state and
    reloads params while frames stream."""
    from raw_image_pipeline_tpu.runtime import sources as src_mod
    from raw_image_pipeline_tpu.runtime.sources import send_frame
    from raw_image_pipeline_tpu.tools import run_pipeline
    import raw_image_pipeline_tpu.runtime.control as ctrl_mod

    out = tmp_path / "out"
    addrs = {}
    made = []

    orig_src = src_mod.SocketFrameSource
    orig_ctrl = ctrl_mod.ControlServer

    def make_src(host="127.0.0.1", port=0):
        s = orig_src(host, port)
        made.append(s)
        addrs["frames"] = s.address
        return s

    def make_ctrl(handlers, host="127.0.0.1", port=0):
        c = orig_ctrl(handlers, host, port)
        addrs["control"] = c.address
        return c

    src_mod.SocketFrameSource = make_src
    ctrl_mod.ControlServer = make_ctrl

    frames = np.random.default_rng(0).integers(0, 256, (3, 64, 96), np.uint8)
    replies = []

    def produce():
        while "frames" not in addrs or "control" not in addrs:
            time.sleep(0.01)
        with socket.create_connection(addrs["frames"]) as s:
            send_frame(s, frames[0])
            time.sleep(0.3)
            replies.append(send_command(addrs["control"], "reset_white_balance"))
            replies.append(send_command(addrs["control"], "reload_params"))
            for f in frames[1:]:
                send_frame(s, f)
                time.sleep(0.15)
        made[0].close()

    t = threading.Thread(target=produce)
    t.start()
    try:
        n = run_pipeline.main([
            "--listen", "127.0.0.1:0", "--control", "127.0.0.1:0",
            "--raw-shape", "64x96", "-o", str(out), "-e", "bayer_gbrg8",
        ])
    finally:
        t.join()
        src_mod.SocketFrameSource = orig_src
        ctrl_mod.ControlServer = orig_ctrl
    assert n >= 1
    assert replies[0] == "ok"
    assert replies[1] == "ok params reloaded"
