"""examples/quickstart.py runs the whole pipeline end to end (MIDI ->
preprocess -> shards -> train -> generate) on toy data."""
import pytest
import importlib.util
import os


@pytest.mark.slow
def test_quickstart_end_to_end(tmp_path):
    spec = importlib.util.spec_from_file_location(
        "quickstart", os.path.join(os.path.dirname(__file__), os.pardir,
                                   "examples", "quickstart.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.main(str(tmp_path))
    gen = [f for dp, _, fs in os.walk(tmp_path / "generated")
           for f in fs if f.endswith(".mid")]
    assert len(gen) == 2
    assert (tmp_path / "models" / "quickstart" / "metrics.jsonl").exists()
    assert (tmp_path / "shards" / "shards.json").exists()
