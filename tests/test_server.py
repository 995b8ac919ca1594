"""WebSocket server protocol integration test (in-process aiohttp client,
tiny models): ready handshake -> msgpack GenerateParams -> JPEG frames ->
completed status; health endpoint; live prompt update message."""
import asyncio
from io import BytesIO

import aiohttp
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from msgpack import packb

from realtime_video_tpu.config import VAEConfig, WanModelConfig, load_server_config
from realtime_video_tpu.models import vae as vae_mod
from realtime_video_tpu.models.diffusion_wrapper import WanDiffusion
from realtime_video_tpu.models.vae_wrapper import VAEWrapper
from realtime_video_tpu.pipelines import CausalInferencePipeline
from realtime_video_tpu.serving.models import Models
from realtime_video_tpu.serving.server import create_app

WAN_TINY = WanModelConfig(dim=64, ffn_dim=128, num_heads=2, num_layers=2)
VAE_TINY = VAEConfig(dim=8, z_dim=16, dim_mult=(1, 1, 2, 2), num_res_blocks=1)


@pytest.fixture(scope="module")
def stack():
    config = load_server_config(
        denoising_step_list=[1000, 500], num_frame_per_block=3
    )
    gen = WanDiffusion(cfg=WAN_TINY, dtype=jnp.bfloat16)
    vae = VAEWrapper(
        cfg=VAE_TINY,
        params=vae_mod.init_vae_params(jax.random.PRNGKey(7), VAE_TINY, jnp.bfloat16),
    )

    class FakeEncoder:
        def __call__(self, text_prompts):
            key = jax.random.PRNGKey(abs(hash(text_prompts[0])) % (2**31))
            return {"prompt_embeds": jax.random.normal(key, (1, 64, WAN_TINY.text_dim), jnp.bfloat16)}

    te = FakeEncoder()
    pipeline = CausalInferencePipeline(config, gen, text_encoder=te, vae=vae)
    models = Models(te, gen, pipeline, vae, vae)
    return config, models


@pytest.fixture
def app(stack):
    # aiohttp Applications bind to the first event loop that starts them —
    # each test runs its own asyncio.run loop, so build a fresh app per test
    # over the shared (expensive) models
    return create_app(*stack)


def test_health_and_ws_stream(app):
    from aiohttp.test_utils import TestClient, TestServer

    async def run():
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            resp = await client.get("/health")
            assert resp.status == 200 and (await resp.text()) == "OK"

            async with client.ws_connect("/session/itest") as ws:
                ready = await ws.receive_json(timeout=30)
                assert ready["status"] == "ready"
                await ws.send_bytes(packb({
                    "prompt": "a cat", "width": 64, "height": 64, "seed": 1,
                    "num_blocks": 2, "num_denoising_steps": 2,
                    "kv_cache_num_frames": 3,
                }))
                frames = 0
                completed = False
                for _ in range(200):
                    msg = await ws.receive(timeout=240)
                    if msg.type == aiohttp.WSMsgType.BINARY:
                        frames += 1
                        if frames == 1:
                            from PIL import Image

                            im = Image.open(BytesIO(msg.data))
                            assert im.size == (64, 64) and im.mode == "RGB"
                        if frames == 3:
                            # live prompt update mid-stream
                            await ws.send_bytes(packb({
                                "prompt": "a dog", "interp_steps": 2
                            }))
                    elif msg.type == aiohttp.WSMsgType.TEXT:
                        if '"completed"' in msg.data:
                            completed = True
                            # drain any frames that raced the completion
                            while frames < 18:
                                try:
                                    m2 = await ws.receive(timeout=10)
                                except Exception:  # noqa: BLE001
                                    break
                                if m2.type == aiohttp.WSMsgType.BINARY:
                                    frames += 1
                                else:
                                    break
                            break
                    else:
                        break
                # block0: 6 frames, block1: 12 -> 18 total
                assert frames == 18, frames
                assert completed

            # /metrics saw the stream: frames counted, TTFF recorded,
            # active count back to zero once server-side teardown finishes
            for _ in range(50):
                resp = await client.get("/metrics")
                assert resp.status == 200
                snap = await resp.json()
                if snap["sessions_active"] == 0:
                    break
                await asyncio.sleep(0.1)
            assert snap["frames_sent_total"] >= 18
            assert snap["sessions_total"] >= 1
            assert snap["sessions_active"] == 0
            assert snap["ttff_ms_p50"] is not None and snap["ttff_ms_p50"] > 0
        finally:
            await client.close()

    asyncio.run(run())


def test_upload_endpoints_and_download(app):
    """upload_start_frame/upload_video roundtrips + download_video after a
    stream (reference endpoints release_server.py:867-919)."""
    import io

    from aiohttp.test_utils import TestClient, TestServer
    from PIL import Image

    async def run():
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            # start-frame upload roundtrip
            buf = io.BytesIO()
            Image.new("RGB", (64, 64), (10, 200, 30)).save(buf, format="PNG")
            data = aiohttp.FormData()
            data.add_field("file", buf.getvalue(), filename="frame.png")
            resp = await client.post("/upload_start_frame", data=data)
            assert resp.status == 200
            body = await resp.json()
            assert body["path"].endswith(".png") and body["filename"] == "frame.png"

            # bad (non-multipart) video upload -> 500 json error, server alive
            resp = await client.post("/upload_video", data=b"not multipart")
            assert resp.status == 500 and "error" in (await resp.json())
            assert (await client.get("/health")).status == 200

            # stream a short session, then download the mp4
            async with client.ws_connect("/session/dl1") as ws:
                await ws.receive_json(timeout=30)
                await ws.send_bytes(packb({
                    "prompt": "a cat", "width": 64, "height": 64, "seed": 1,
                    "num_blocks": 1, "num_denoising_steps": 1,
                    "kv_cache_num_frames": 3,
                }))
                for _ in range(100):
                    msg = await ws.receive(timeout=240)
                    if msg.type == aiohttp.WSMsgType.TEXT and "completed" in msg.data:
                        break
            resp = await client.get("/download_video/dl1")
            if resp.status == 200:
                assert resp.content_type == "video/mp4"
                assert len(await resp.read()) > 100
                # storage consumed -> second download 404s
                assert (await client.get("/download_video/dl1")).status == 404
            else:
                # no mp4 encoder available in this environment
                assert resp.status in (404, 500)
        finally:
            await client.close()

    asyncio.run(run())


def test_midstream_reset_keeps_server_alive(app):
    """action:'reset' mid-stream disposes and replaces the session without
    killing the socket (release_server.py reset handling)."""
    from aiohttp.test_utils import TestClient, TestServer

    async def run():
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            async with client.ws_connect("/session/rst1") as ws:
                await ws.receive_json(timeout=30)
                await ws.send_bytes(packb({
                    "prompt": "a cat", "width": 64, "height": 64, "seed": 1,
                    "num_blocks": 2, "num_denoising_steps": 1,
                    "kv_cache_num_frames": 3,
                }))
                # wait for at least one frame, then reset
                got_frame = False
                for _ in range(100):
                    msg = await ws.receive(timeout=240)
                    if msg.type == aiohttp.WSMsgType.BINARY:
                        got_frame = True
                        break
                assert got_frame
                await ws.send_bytes(packb({"action": "reset"}))
                # reference semantics (release_server.py:1046-1048): reset
                # disposes the session; the stream may continue with the new
                # session's frames or finish with "completed" — either way
                # the socket and server must stay healthy
                for _ in range(50):
                    try:
                        msg = await ws.receive(timeout=20)
                    except asyncio.TimeoutError:
                        break
                    if msg.type in (aiohttp.WSMsgType.TEXT, aiohttp.WSMsgType.BINARY):
                        continue
                    break
            assert (await client.get("/health")).status == 200
        finally:
            await client.close()

    asyncio.run(run())


def test_second_concurrent_session_refused(app):
    """Sessions share the pipeline's KV/cross-attn caches (same
    single-active-session model as the reference's 1-worker generate pool,
    release_server.py:918); a second concurrent WS must be refused with an
    error instead of silently corrupting the first, and the slot must free
    when the first socket closes."""
    from aiohttp.test_utils import TestClient, TestServer

    async def run():
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            async with client.ws_connect("/session/busy1") as ws1:
                ready = await ws1.receive_json(timeout=30)
                assert ready["status"] == "ready"
                async with client.ws_connect("/session/busy2") as ws2:
                    msg = await ws2.receive_json(timeout=30)
                    assert "busy" in msg.get("error", ""), msg
            # slot freed after ws1 closed
            for _ in range(50):
                if app.get("active_ws_sessions", 0) == 0:
                    break
                await asyncio.sleep(0.1)
            async with client.ws_connect("/session/busy3") as ws3:
                ready = await ws3.receive_json(timeout=30)
                assert ready["status"] == "ready"
        finally:
            await client.close()

    asyncio.run(run())


def test_midstream_garbage_does_not_kill_session(app):
    """A malformed mid-stream binary frame (undecodable msgpack) or a control
    dict with garbage field types must be logged and skipped — the live
    session keeps streaming (the reference similarly tolerates protocol
    drift; a client bug must not tear down generation)."""
    from aiohttp.test_utils import TestClient, TestServer

    async def run():
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            async with client.ws_connect("/session/garb1") as ws:
                await ws.receive_json(timeout=30)
                await ws.send_bytes(packb({
                    "prompt": "a cat", "width": 64, "height": 64, "seed": 1,
                    "num_blocks": 2, "num_denoising_steps": 1,
                    "kv_cache_num_frames": 3,
                }))
                # poison mid-stream: raw garbage, then a dict whose seed
                # cannot int() — both previously escaped the receive loop
                await ws.send_bytes(b"\xc1\xff\x00 not msgpack")
                await ws.send_bytes(packb({"seed": "not-a-number"}))
                frames = 0
                completed = False
                for _ in range(200):
                    msg = await ws.receive(timeout=240)
                    if msg.type == aiohttp.WSMsgType.BINARY:
                        frames += 1
                    elif msg.type == aiohttp.WSMsgType.TEXT:
                        if msg.json().get("status") == "completed":
                            completed = True
                            break
                    else:
                        break
                assert frames >= 18, f"stream died after garbage ({frames} frames)"
                assert completed
            assert (await client.get("/health")).status == 200
        finally:
            await client.close()

    asyncio.run(run())
