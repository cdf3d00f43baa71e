"""Remote viewer endpoint (SIBR network-GUI protocol).

TPU-native replacement for the reference's `gaussian_renderer/
network_gui.py:26-85` TCP stub (polled from the train loop at
`train.py:113-127`, shipped disabled). Wire protocol:

  client -> server: 4-byte LE length + UTF-8 JSON
      {resolution_x, resolution_y, train, fov_y, fov_x, z_near, z_far,
       rot_scale_python, keep_alive, scaling_modifier,
       view_matrix (16 floats), view_projection_matrix (16 floats)}
  server -> client: H*W*3 raw uint8 bytes, then
      4-byte LE length + ASCII verify string (the model path)

The reference flips the Y/Z columns of the incoming OpenGL-style view
matrix before use (`network_gui.py:73-74`); we do the same and derive
our (viewmat, K) camera from it. Beyond the in-train poll, this module
also provides `serve_model` — a blocking viewer loop over a trained
model directory, which the reference lacks (no `serve()` anywhere; SIBR
only reads exported PLYs offline).
"""
from __future__ import annotations

import json
import math
import socket
import time
from typing import Optional

import numpy as np


def _recv_exact(conn: socket.socket, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        chunk = conn.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("client disconnected")
        buf += chunk
    return buf


class ViewerServer:
    def __init__(self, host: str = "127.0.0.1", port: int = 6009):
        self.host, self.port = host, port
        self.listener = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self.listener.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.listener.bind((host, port))
        self.listener.listen()
        self.listener.settimeout(0)        # non-blocking accept (poll)
        self.conn: Optional[socket.socket] = None

    @property
    def bound_port(self) -> int:
        return self.listener.getsockname()[1]

    def try_connect(self) -> bool:
        if self.conn is not None:
            return True
        try:
            self.conn, _ = self.listener.accept()
            self.conn.settimeout(None)
            return True
        except (BlockingIOError, socket.timeout, OSError):
            return False

    def receive(self) -> Optional[dict]:
        """One message -> dict with a render-ready `camera`, or None for
        the 0x0 keep-alive resolution."""
        n = int.from_bytes(_recv_exact(self.conn, 4), "little")
        msg = json.loads(_recv_exact(self.conn, n).decode("utf-8"))
        width, height = msg["resolution_x"], msg["resolution_y"]
        if width == 0 or height == 0:
            return None
        view = np.array(msg["view_matrix"], dtype=np.float32).reshape(4, 4)
        view[:, 1] = -view[:, 1]
        view[:, 2] = -view[:, 2]
        # incoming matrix is row-vector convention (x @ M); ours is M @ x
        viewmat = view.T
        fx = width / (2.0 * math.tan(msg["fov_x"] / 2.0))
        fy = height / (2.0 * math.tan(msg["fov_y"] / 2.0))
        K = np.array([[fx, 0, width / 2.0], [0, fy, height / 2.0],
                      [0, 0, 1]], dtype=np.float32)
        return {"width": width, "height": height, "viewmat": viewmat,
                "K": K, "train": bool(msg.get("train", True)),
                "keep_alive": bool(msg.get("keep_alive", True)),
                "scaling_modifier": float(msg.get("scaling_modifier", 1.0))}

    def send_image(self, image: Optional[np.ndarray], verify: str) -> None:
        """image (H, W, 3) float [0,1] -> raw bytes + verify string.
        image=None sends just the verify frame (keep-alive reply,
        `network_gui.py:49-53`)."""
        if image is not None:
            arr = (np.clip(np.asarray(image), 0.0, 1.0)
                   * 255).astype(np.uint8)
            self.conn.sendall(arr.tobytes())
        self.conn.sendall(len(verify).to_bytes(4, "little"))
        self.conn.sendall(verify.encode("ascii"))

    def drop_client(self) -> None:
        if self.conn is not None:
            try:
                self.conn.close()
            finally:
                self.conn = None

    def close(self) -> None:
        self.drop_client()
        self.listener.close()

    def poll(self, render_cb, verify: str) -> None:
        """In-train poll (`train.py:114-127` semantics): if a client is
        connected, answer every pending request with `render_cb(cam_dict)
        -> (H, W, 3)`; drop the client on any protocol error."""
        if not self.try_connect():
            return
        try:
            self.conn.settimeout(0.005)
            try:
                cam = self.receive()
            except (BlockingIOError, socket.timeout):
                return
            finally:
                self.conn.settimeout(None)
            if cam is not None:
                self.send_image(render_cb(cam), verify)
            else:
                self.send_image(None, verify)
        except Exception:
            self.drop_client()


def serve_model(model_path: str, host: str = "127.0.0.1", port: int = 6009,
                rasterizer: str = "auto", load_iteration: int = -1,
                max_requests: Optional[int] = None) -> None:
    """Blocking viewer loop over a trained model directory."""
    import jax.numpy as jnp
    from horizongs_tpu.cli.common import load_config
    from horizongs_tpu.core.cameras import Camera
    from horizongs_tpu.data.scene import Scene
    from horizongs_tpu.render import render
    from horizongs_tpu.train.optim import mlps_from_params
    from horizongs_tpu.train.trainer import pick_rasterizer
    import os

    lp, op, pp, cfg = load_config(os.path.join(model_path, "config.yaml"),
                                  model_path)
    scene = Scene(lp, cfg, load_iteration=load_iteration)
    ts = scene.train_state
    mlps = mlps_from_params(ts.params)
    state = ts.anchor_state()
    rast = pick_rasterizer(rasterizer)

    srv = ViewerServer(host, port)
    served = 0
    try:
        while max_requests is None or served < max_requests:
            if not srv.try_connect():
                time.sleep(0.02)
                continue
            try:
                cam_d = srv.receive()
            except ConnectionError:
                srv.drop_client()
                continue
            if cam_d is None:
                srv.send_image(None, model_path)
                continue
            cam = Camera(viewmat=jnp.asarray(cam_d["viewmat"]),
                         K=jnp.asarray(cam_d["K"]),
                         width=cam_d["width"], height=cam_d["height"],
                         cam_center=jnp.asarray(
                             np.linalg.inv(cam_d["viewmat"])[:3, 3]))
            pkg = render(cam, scene.cfg, mlps, state, jnp.zeros(3),
                         rasterizer=rast,
                         scaling_modifier=cam_d.get("scaling_modifier", 1.0))
            srv.send_image(np.asarray(pkg["render"]), model_path)
            served += 1
    finally:
        srv.close()
