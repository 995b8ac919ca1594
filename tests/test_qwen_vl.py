"""Qwen-VL preprocessing parity (reference: wan/utils/qwen_vl_utils.py)."""
import numpy as np
import pytest

from realtime_video_tpu.utils.qwen_vl import (
    FRAME_FACTOR,
    IMAGE_FACTOR,
    MAX_PIXELS,
    MIN_PIXELS,
    extract_vision_info,
    fetch_image,
    smart_nframes,
    smart_resize,
)


def test_smart_resize_properties():
    for h, w in [(480, 832), (1080, 1920), (28, 28), (3000, 4000), (50, 70)]:
        nh, nw = smart_resize(h, w)
        assert nh % IMAGE_FACTOR == 0 and nw % IMAGE_FACTOR == 0
        assert MIN_PIXELS <= nh * nw <= MAX_PIXELS
        if min(h, w) >= 4 * IMAGE_FACTOR:
            # aspect preserved (tiny inputs legitimately distort: 28-rounding)
            assert abs((nh / nw) - (h / w)) / (h / w) < 0.35


def test_smart_resize_rejects_extreme_aspect():
    with pytest.raises(ValueError):
        smart_resize(10, 4000)


def test_smart_nframes():
    # explicit nframes rounds to FRAME_FACTOR
    assert smart_nframes({"nframes": 7}, total_frames=100, video_fps=30) == 8
    # fps-derived: 100 frames @30fps sampled at 2fps ~ 6.67 -> rounded, clamped
    n = smart_nframes({}, total_frames=100, video_fps=30.0)
    assert n % FRAME_FACTOR == 0 and 4 <= n <= 100
    with pytest.raises(ValueError):
        smart_nframes({"nframes": 4, "fps": 2}, total_frames=10, video_fps=30)


def test_fetch_image_resizes(tmp_path):
    PIL = pytest.importorskip("PIL")
    from PIL import Image

    p = tmp_path / "img.png"
    Image.fromarray(
        np.random.randint(0, 255, (50, 70, 3), np.uint8)
    ).save(p)
    img = fetch_image({"image": str(p)})
    assert img.height % IMAGE_FACTOR == 0 and img.width % IMAGE_FACTOR == 0
    assert img.height * img.width >= MIN_PIXELS


def test_extract_vision_info():
    conv = [
        {"role": "user", "content": [
            {"type": "image", "image": "a.png"},
            {"type": "text", "text": "describe"},
            {"video": "b.mp4"},
        ]}
    ]
    infos = extract_vision_info(conv)
    assert len(infos) == 2
    assert infos[0]["image"] == "a.png" and infos[1]["video"] == "b.mp4"
