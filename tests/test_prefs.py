"""App preference persistence (raytracer/app.cxx:70-77,114-124)."""

import json
import os

from etx_tracer_tpu.utils import prefs


def test_recent_files_roundtrip(tmp_path, monkeypatch):
  monkeypatch.setenv("ETX_TPU_CONFIG_DIR", str(tmp_path))
  scenes = []
  for i in range(12):
    p = tmp_path / f"scene{i}.json"
    p.write_text("{}")
    scenes.append(str(p))
    prefs.add_recent(str(p), integrator="vcm")

  d = prefs.load()
  assert d["integrator"] == "vcm"
  # bounded to 10, most recent first
  assert len(d["recent_files"]) == 10
  assert d["recent_files"][0] == os.path.abspath(scenes[-1])

  # re-opening an old scene moves it to the front without duplication
  prefs.add_recent(scenes[-3])
  d = prefs.load()
  assert d["recent_files"][0] == os.path.abspath(scenes[-3])
  assert d["recent_files"].count(os.path.abspath(scenes[-3])) == 1

  # recent_files() filters out deleted scenes
  os.remove(scenes[-1])
  assert os.path.abspath(scenes[-1]) not in prefs.recent_files()


def test_corrupt_prefs_are_ignored(tmp_path, monkeypatch):
  monkeypatch.setenv("ETX_TPU_CONFIG_DIR", str(tmp_path))
  (tmp_path / "options.json").write_text("not json{")
  assert prefs.load() == {}
  p = tmp_path / "s.json"
  p.write_text("{}")
  prefs.add_recent(str(p))
  assert json.loads((tmp_path / "options.json").read_text())["recent_files"]
