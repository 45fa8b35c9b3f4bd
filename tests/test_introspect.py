"""Observability, checkpoint/resume, and docs-plane tests
(SURVEY.md §5 — additions the reference lacks)."""

import numpy as np
import pytest

from pothoscomms_tpu import BlockRegistry, Topology
from pothoscomms_tpu.core.fixtures import CollectorSink, FeederSource
from pothoscomms_tpu.core.introspect import block_doc, catalog
from pothoscomms_tpu.core.testing import assert_buffers_close, assert_buffers_equal


def test_query_stats():
    feed = FeederSource("float32")
    feed.feed_buffer(np.ones(100, np.float32))
    scale = BlockRegistry.make("/comms/scale", "float32")
    scale.set_factor(2.0)
    sink = CollectorSink("float32")
    topo = Topology()
    topo.connect(feed, 0, scale, 0)
    topo.connect(scale, 0, sink, 0)
    topo.commit()
    assert topo.wait_inactive()
    stats = topo.query_stats()
    s = stats[scale.name]
    assert s["work_calls"] >= 1
    assert s["inputs"]["0"]["consumed"] == 100
    assert s["outputs"]["0"]["produced"] == 100
    assert s["work_time_s"] >= 0.0


def test_checkpoint_resume_iir(tmp_path):
    """Carry-state checkpoint: run half a stream, checkpoint, restore
    into a fresh topology, and the second half must continue exactly."""
    rng = np.random.default_rng(0)
    x = rng.normal(size=400)
    taps = [0.2, 0.3, 1.0, -0.5]

    def build():
        feed = FeederSource("float64")
        iir = BlockRegistry.make("/comms/iir_filter", "float64")
        iir.set_taps(taps)
        sink = CollectorSink("float64")
        topo = Topology()
        topo.connect(feed, 0, iir, 0)
        topo.connect(iir, 0, sink, 0)
        return topo, feed, iir, sink

    # continuous run (the oracle)
    topo, feed, iir, sink = build()
    feed.feed_buffer(x)
    topo.commit()
    assert topo.wait_inactive()
    full = sink.get_buffer()

    # run first half, checkpoint
    topo1, feed1, iir1, sink1 = build()
    feed1.feed_buffer(x[:200])
    topo1.commit()
    assert topo1.wait_inactive()
    ckpt = str(tmp_path / "state.pkl")
    topo1.save_state(ckpt)
    first = sink1.get_buffer()

    # fresh topology, restore, run second half
    topo2, feed2, iir2, sink2 = build()
    topo2.commit()  # commit resets state; restore must override it
    topo2.load_state(ckpt)
    sink2.clear()
    feed2.feed_buffer(x[200:])
    assert topo2.wait_inactive()
    second = sink2.get_buffer()

    assert_buffers_close(full, np.concatenate([first, second]), 1e-12)


def test_checkpoint_covers_port_queues(tmp_path):
    # FIR keeps K-1 history samples queued in the port: a checkpoint must
    # carry them so the restored stream is seamless
    rng = np.random.default_rng(1)
    x = rng.normal(size=300)
    taps = rng.normal(size=15)

    def build():
        feed = FeederSource("float64")
        fir = BlockRegistry.make("/comms/fir_filter", "float64", "REAL")
        fir.set_taps(taps)
        sink = CollectorSink("float64")
        topo = Topology()
        topo.connect(feed, 0, fir, 0)
        topo.connect(fir, 0, sink, 0)
        return topo, feed, sink

    topo, feed, sink = build()
    feed.feed_buffer(x)
    topo.commit()
    assert topo.wait_inactive()
    full = sink.get_buffer()

    topo1, feed1, sink1 = build()
    feed1.feed_buffer(x[:150])
    topo1.commit()
    assert topo1.wait_inactive()
    ckpt = str(tmp_path / "fir.pkl")
    topo1.save_state(ckpt)
    first = sink1.get_buffer()

    topo2, feed2, sink2 = build()
    topo2.commit()
    topo2.load_state(ckpt)
    sink2.clear()
    feed2.feed_buffer(x[150:])
    assert topo2.wait_inactive()
    second = sink2.get_buffer()
    assert_buffers_close(full, np.concatenate([first, second]), 1e-12)


def test_checkpoint_type_mismatch(tmp_path):
    feed = FeederSource("float32")
    sink = CollectorSink("float32")
    topo = Topology()
    topo.connect(feed, 0, sink, 0)
    topo.commit()
    p = str(tmp_path / "s.pkl")
    topo.save_state(p)
    other = Topology()
    f2 = FeederSource("float32")
    s2 = CollectorSink("float32")
    scale = BlockRegistry.make("/comms/scale", "float32")
    other.connect(f2, 0, scale, 0)
    other.connect(scale, 0, s2, 0)
    with pytest.raises(ValueError):
        other.load_state(p)


def test_block_doc_schema():
    fir = BlockRegistry.make("/comms/fir_filter", "float32", "REAL")
    doc = block_doc(fir)
    assert doc["type"] == "FIRFilter"
    assert "taps" in doc["params"]
    assert "decimation" in doc["params"]
    assert doc["inputs"] == ["0"] and doc["outputs"] == ["0"]
    assert "FIR" in doc["doc"] or "resampl" in doc["doc"]

    designer = BlockRegistry.make("/comms/fir_designer")
    ddoc = block_doc(designer)
    assert "tapsChanged" in ddoc["signals"]


def test_catalog_covers_all_comms_paths():
    cat = catalog()
    from pothoscomms_tpu import BlockRegistry as BR

    comms = [p for p in BR.paths() if p.startswith("/comms/")]
    assert set(cat) == set(comms)
    documented = [p for p, d in cat.items() if "error" not in d]
    # the vast majority must be instantiable with defaults
    assert len(documented) >= len(comms) - 2, sorted(
        p for p, d in cat.items() if "error" in d
    )


def test_cli_list_and_doc(capsys):
    from pothoscomms_tpu.__main__ import main

    from pothoscomms_tpu import BlockRegistry as BR

    assert main(["list"]) == 0
    out = capsys.readouterr().out.splitlines()
    assert "/comms/fft" in out and len(out) == len(BR.paths())

    assert main(["doc", "/comms/fir_filter", "float32"]) == 0
    import json

    doc = json.loads(capsys.readouterr().out)
    assert "decimation" in doc["params"]

    assert main(["nonsense"]) == 2


def test_catalog_has_no_unconstructible_entries():
    """VERDICT r3 weak #7: a registry entry whose factory regresses must
    fail this test instead of silently degrading the docs plane."""
    cat = catalog()
    broken = [p for p, d in cat.items() if d.get("type") == "?"]
    assert broken == [], f"unconstructible catalog entries: {broken}"


def test_fir_designer_doc_form_parity():
    """The docs plane must carry what |PothosDoc carries (reference
    filter/FIRDesigner.cpp:20-137): defaults, option enums, units,
    widget and preview hints — enough for a GUI to render the form."""
    from pothoscomms_tpu import BlockRegistry

    doc = block_doc(BlockRegistry.make("/comms/fir_designer"))
    p = doc["params"]
    assert doc["category"] == "/Filter"
    assert "remez" in doc["keywords"]
    # option enums
    ft = [o["value"] for o in p["filter_type"]["options"]]
    assert set(ft) == {"ROOT_RAISED_COSINE", "RAISED_COSINE", "SINC",
                       "MAXFLAT", "GAUSSIAN", "REMEZ"}
    bt = [o["value"] for o in p["band_type"]["options"]]
    assert "COMPLEX_BAND_PASS" in bt
    wt = [o["value"] for o in p["window_type"]["options"]]
    assert {"kaiser", "chebyshev", "hann"} <= set(wt)
    # units
    assert p["sample_rate"]["units"] == "Sps"
    assert p["frequency_lower"]["units"] == "Hz"
    assert p["stop_db"]["units"] == "dB"
    # defaults + widget/preview hints
    assert p["num_taps"]["default"] == 51
    assert "SpinBox" in p["num_taps"]["widget"]
    assert "REMEZ" in p["bandwidth_trans"]["preview"]
    # every labelled option param renders: label present on all specs
    for name in ("filter_type", "band_type", "window_type", "gain",
                 "alpha", "num_taps"):
        assert p[name].get("label"), name


def test_catalog_params_carry_defaults():
    """Spot-check generic default extraction through getters and the
    explicit DOC specs of key blocks."""
    cat = catalog()
    fft = cat["/comms/fft"]["params"]
    assert fft["num_bins"]["default"] == 1024
    assert any(o["value"] == 4096 for o in fft["num_bins"]["options"])
    wave = cat["/comms/waveform_source"]["params"]
    assert [o["value"] for o in wave["waveform"]["options"]] == [
        "CONST", "SINE", "RAMP", "SQUARE"]
    assert wave["frequency"]["units"] == "Hz"
    probe = cat["/comms/signal_probe"]["params"]
    assert {o["value"] for o in probe["mode"]["options"]} == {
        "VALUE", "RMS", "MEAN"}
    fir = cat["/comms/fir_filter"]["params"]
    assert fir["decimation"]["default"] == 1
