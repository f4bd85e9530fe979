"""LMP client ↔ stub server round trip (apps/lmp_client.py) and its use as
AffordancePipeline's run_lmp callable."""
import numpy as np
import pytest

from dexgangrasp_tpu.apps.afford import run_lmp_with_retry
from dexgangrasp_tpu.apps.lmp_client import LmpClient, LmpStubServer


def _frame(h=60, w=80):
    img = np.full((h, w, 3), 200, np.uint8)
    img[20:40, 30:60] = 40  # dark object mid-frame
    return img


def test_round_trip_returns_object_mask(tmp_path):
    with LmpStubServer() as srv:
        client = LmpClient(srv.endpoint, prompt="handle",
                           save_mask_path=str(tmp_path / "mask_0000.npy"))
        mask = client(_frame())
    assert mask.shape == (60, 80) and mask.dtype == bool
    # the dark blob is segmented, the bright border is not
    assert mask[25:35, 35:55].mean() > 0.9
    assert not mask[:5].any() and not mask[-5:].any()
    assert client.last_part_name == "stub_part"
    # offline-replay sidecar written (dexafford_prompt_offline contract)
    saved = np.load(tmp_path / "mask_0000.npy")
    np.testing.assert_array_equal(saved, mask)


def test_retry_loop_integration():
    calls = []
    with LmpStubServer() as srv:
        client = LmpClient(srv.endpoint)

        def flaky(img):
            calls.append(1)
            if len(calls) < 3:
                raise ConnectionError("transient")
            return client(img)

        mask = run_lmp_with_retry(flaky, _frame(), max_retries=5,
                                  delay_s=0.0)
    assert len(calls) == 3 and mask.any()


def test_custom_segmenter_and_404():
    from urllib.error import HTTPError

    with LmpStubServer(segmenter=lambda c, p: np.ones(c.shape[:2], bool)) \
            as srv:
        client = LmpClient(srv.endpoint)
        assert client(_frame()).all()
        bad = LmpClient(srv.endpoint + "/nope")
        with pytest.raises(HTTPError):
            bad(_frame())
