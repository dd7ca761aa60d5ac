"""Wire protocol: COBS + postcard encoding, tolerant receiver, stream render."""

import numpy as np
import pytest

from raytracer_weekend_tpu.parallel import stream as S


@pytest.mark.parametrize("payload", [
    b"", b"\x00", b"abc", b"a\x00b", b"\x00\x00", bytes(range(1, 256)) * 2,
    bytes(300), b"x" * 254, b"x" * 255,
])
def test_cobs_roundtrip(payload):
    assert S.cobs_decode(S.cobs_encode(payload)) == payload
    assert b"\x00" not in S.cobs_encode(payload)


def test_message_roundtrip():
    msgs = [
        S.ImageStart(400, 225, 100),
        S.Pixel(3, 7, (0.25, 0.5, 4.0)),
        S.Pixel(2**20, 2**14, (-1.0, 0.0, 1e9)),
        S.ImageEnd(),
    ]
    blob = b"".join(S.encode_message(m) for m in msgs)
    rx = S.ImageReceiver()
    rx.feed(blob)
    assert rx.done
    assert rx.image.shape == (225, 400, 3)
    np.testing.assert_allclose(rx.image[3, 7], [0.25, 0.5, 4.0])
    assert rx.errors == 0


def test_receiver_tolerates_corruption():
    # Corrupt/truncated frames are skipped (receiver main.rs:42-49).
    good = S.encode_message(S.ImageStart(4, 4, 1))
    junk = b"\x07garbage\x00" + b"\x02\x00"          # bad frames
    pix = S.encode_message(S.Pixel(1, 2, (1.0, 2.0, 3.0)))
    truncated = S.encode_message(S.Pixel(3, 3, (9, 9, 9)))[:-6]  # cut mid-frame
    end = S.encode_message(S.ImageEnd())
    rx = S.ImageReceiver()
    rx.feed(good + junk + pix + truncated + b"\x00" + end)
    assert rx.done
    assert rx.pixels_received == 1
    assert rx.errors >= 1
    np.testing.assert_allclose(rx.image[1, 2], [1, 2, 3])


def test_resync_preamble_ignored():
    rx = S.ImageReceiver()
    rx.feed(b"\x00\x00\x00\x00" + S.encode_message(S.ImageStart(2, 2, 1)))
    assert rx.image is not None


def test_feed_carries_partial_frames():
    # Regression (ADVICE r2): a tailing reader hands the receiver arbitrary
    # read chunks that usually end mid-frame. Bytes after the last 0x00
    # delimiter must be held back and joined with the next feed() — not
    # decoded as a (garbage) frame. Feed the stream 1 byte at a time: every
    # pixel must land, with zero decode errors.
    msgs = [S.ImageStart(3, 2, 1)]
    msgs += [S.Pixel(r, c, (r + 0.5, c + 0.5, 0.0))
             for r in range(2) for c in range(3)]
    msgs.append(S.ImageEnd())
    blob = b"".join(S.encode_message(m) for m in msgs)
    rx = S.ImageReceiver()
    for i in range(len(blob)):
        rx.feed(blob[i:i + 1])
    assert rx.done
    assert rx.errors == 0
    assert rx.pixels_received == 6
    np.testing.assert_allclose(rx.image[1, 2], [1.5, 2.5, 0.0])


def test_stream_render_matches_direct():
    import jax.numpy as jnp
    from raytracer_weekend_tpu import integrator
    from raytracer_weekend_tpu.camera import make_camera
    from raytracer_weekend_tpu.config import RenderConfig
    from raytracer_weekend_tpu.scene import builder as B

    objs = [B.Sphere((0, 0, -2), 0.6, B.Lambertian((0.6, 0.3, 0.2)))]
    scene, static = B.build_scene(objs, background=(0.7, 0.8, 1.0))
    cfg = RenderConfig(width=8, height=4, samples_per_pixel=2, max_depth=3)
    cam = make_camera((0, 0, 1), (0, 0, -2), (0, 1, 0), 40.0,
                      cfg.aspect_ratio, 0.0, 3.0, 0.0, 1.0)

    chunks = []
    img = S.stream_render(scene, static, cfg, cam, chunks.append,
                          chunk_pixels=8)
    direct = np.asarray(integrator.render_image(scene, static, cfg, cam))
    np.testing.assert_allclose(img, direct, atol=1e-5)

    rx = S.ImageReceiver()
    rx.feed(b"".join(chunks))
    assert rx.done
    assert rx.pixels_received == cfg.n_pixels
    np.testing.assert_allclose(rx.image, direct, rtol=1e-6)


def test_live_view_tool(tmp_path):
    # Runnable receiver (live_view.py): tails a stream file and rewrites a
    # PNG — the working twin of the GUI receiver's rx loop
    # (discovery_host_receiver_gui/src/main.rs:50-145).
    from raytracer_weekend_tpu.utils import live_view
    from raytracer_weekend_tpu.utils.image import tone_map

    msgs = (b"\x00\x00\x00\x00"
            + S.encode_message(S.ImageStart(4, 2, 1))
            + b"\x05junk\x00"
            + b"".join(S.encode_message(S.Pixel(r, c, (0.1 * (r + 1),
                                                       0.2, 0.5 * (c + 1))))
                       for r in range(2) for c in range(4))
            + S.encode_message(S.ImageEnd()))
    src = tmp_path / "render.stream"
    src.write_bytes(msgs)
    out = tmp_path / "live.png"

    rx = live_view.run(str(src), str(out), follow=False, once=True,
                       quiet=True)
    assert rx.done and rx.pixels_received == 8 and rx.errors >= 1
    assert out.exists() and out.stat().st_size > 0

    # PNG content = tone-mapped accumulator, same map as cli.py output.
    from PIL import Image
    got = np.asarray(Image.open(out).convert("RGB"))
    np.testing.assert_array_equal(got, tone_map(rx.image, rx.spp))

    # main() drives the same path
    out2 = tmp_path / "live2.png"
    assert live_view.main([str(src), "-o", str(out2), "--no-follow",
                           "--once"]) == 0
    assert out2.exists()
