"""Static protocol-sync checks for the browser demo page.

There is no JS runtime (node/bun/chromium) in this environment, so the inline
msgpack encoder cannot be executed here; these tests pin everything that can
drift server-side instead:

  * every field `currentParams()` sends exists on GenerateParams (a renamed
    pydantic field would silently drop a UI control);
  * the page carries the protocol hooks the server speaks (ready/completed
    status JSON, /session/ WS URL, reset/prompt-update/webcam-image message
    shapes, upload + download endpoints);
  * the inline encoder covers every value type its own messages contain.
"""
import re
from pathlib import Path

from realtime_video_tpu.serving.params import GenerateParams

HTML = (Path(__file__).parent.parent / "templates" / "release_demo.html").read_text()


def test_current_params_fields_exist_on_generate_params():
    block = re.search(r"function currentParams\(\).*?return \{(.*?)\n  \};",
                      HTML, re.S).group(1)
    fields = re.findall(r"^\s*(\w+):", block, re.M)
    assert len(fields) >= 8, fields
    model_fields = set(GenerateParams.model_fields)
    missing = [f for f in fields if f not in model_fields]
    assert not missing, f"demo page sends unknown params: {missing}"


def test_protocol_hooks_present():
    for needle in (
        "/session/",                 # WS endpoint (release_server.py:1082)
        'status === "ready"',        # handshake
        'status === "completed"',
        'action: "reset"',           # mid-stream reset (release_server.py:1055)
        "interp_steps",              # live prompt blend
        "image:",                    # webcam frame push
        "/upload_video",
        "/download_video/",
        "image/jpeg",                # frame decode path
    ):
        assert needle in HTML, f"demo page lost protocol hook: {needle!r}"


def test_inline_encoder_covers_message_value_types():
    """The page's own messages use null/bool/int/float/str/bin/map — the
    encoder must have a branch for each msgpack family it emits."""
    enc = re.search(r"function mpEncode.*?\n\}", HTML, re.S).group(0)
    for marker, family in [
        ("0xc0", "nil"), ("0xc3", "bool"), ("0xce", "uint32"),
        ("0xcb", "float64"), ("0xa0", "fixstr"), ("0xc4", "bin8"),
        ("0x80", "fixmap"), ("0xde", "map16"),
    ]:
        assert marker in enc, f"mpEncode missing the {family} family"
