"""Device-side uint8 normalization == host Normalize (+ zero pad)."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from siammot_tpu.configs.defaults import get_cfg
from siammot_tpu.data.augmentation import Normalize
from siammot_tpu.models.siammot import SiamMOT, normalize_images

MEAN = (0.485, 0.456, 0.406)
STD = (0.229, 0.224, 0.225)


def test_normalize_images_matches_host(rng):
    raw = rng.randint(0, 256, (2, 40, 56, 3), np.uint8)
    sizes = np.asarray([[56, 40], [33, 25]], np.int32)   # (w, h)

    got = np.asarray(normalize_images(
        jnp.asarray(raw), MEAN, STD, False, jnp.asarray(sizes)))

    host, _ = Normalize(MEAN, STD)(list(raw), None, None)
    for i in range(2):
        w, h = sizes[i]
        want = host[i].copy()
        want[h:] = 0.0
        want[:, w:] = 0.0
        np.testing.assert_allclose(got[i], want, atol=1e-6)


def test_normalize_images_f32_passthrough(rng):
    x = rng.randn(1, 8, 8, 3).astype(np.float32)
    out = normalize_images(jnp.asarray(x), MEAN, STD, False)
    np.testing.assert_array_equal(np.asarray(out), x)


@pytest.mark.slow
def test_uint8_inference_matches_f32(rng):
    """Full inference step: raw uint8 frame == host-normalized f32 frame
    (pad zeroed) at tight tolerance."""
    cfg = get_cfg()
    cfg.MODEL.RPN.PRE_NMS_TOP_N_TEST = 64
    cfg.MODEL.RPN.POST_NMS_TOP_N_TEST = 16
    cfg.MODEL.RPN.FPN_POST_NMS_TOP_N_TEST = 16
    cfg.TPU.MAX_TRACKS = 4
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.freeze()
    model = SiamMOT(cfg)
    params = model.init_params(jax.random.PRNGKey(0), (64, 96))

    raw = rng.randint(0, 256, (1, 64, 96, 3), np.uint8)
    raw[:, 50:] = 0          # fake pad region
    raw[:, :, 80:] = 0
    image_size = (80, 50)

    host, _ = Normalize(cfg.INPUT.PIXEL_MEAN, cfg.INPUT.PIXEL_STD)(
        [raw[0]], None, None)
    f32 = host[0].copy()
    f32[50:] = 0.0
    f32[:, 80:] = 0.0

    out_u8, _ = model.forward_inference(
        params, jnp.asarray(raw), model.empty_state(),
        image_size=image_size)
    out_f32, _ = model.forward_inference(
        params, jnp.asarray(f32[None]), model.empty_state(),
        image_size=image_size)

    np.testing.assert_allclose(np.asarray(out_u8.boxes),
                               np.asarray(out_f32.boxes),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(out_u8.scores),
                               np.asarray(out_f32.scores),
                               rtol=1e-4, atol=1e-4)
