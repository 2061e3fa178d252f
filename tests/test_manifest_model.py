"""Property test: snapshot-manifest content resolution vs a naive
model. Pure python (no Spark) — `content_files` / `table_files` are
metadata functions; hypothesis drives random append/overwrite/replace
histories and checks every snapshot's resolved content against a
straightforward simulation."""

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from prefix_filter_spark.sources import iceberg as ice


def _write_manifest(tmp, entries):
    (tmp / "metadata").mkdir(parents=True, exist_ok=True)
    (tmp / "metadata" / "snapshots.json").write_text(json.dumps(entries))


ops = st.lists(
    st.sampled_from(["append", "overwrite", "replace"]), min_size=1, max_size=12
)


@settings(max_examples=200, deadline=None)
@given(ops=ops, data=st.data())
def test_content_files_matches_naive_model(tmp_path_factory, ops, data):
    tmp = tmp_path_factory.mktemp("man")
    entries = []
    model: dict[int, list[str]] = {}
    content: list[str] = []
    for i, op in enumerate(ops, start=1):
        n = data.draw(st.integers(min_value=0, max_value=3))
        files = [f"s{i}_f{j}" for j in range(n)]
        entries.append(
            {"snapshot_id": i, "operation": op, "ts": 0.0, "files": files}
        )
        if op in ("overwrite", "replace"):
            content = list(files)
        else:
            content = content + files
        model[i] = list(content)
    _write_manifest(tmp, entries)
    for sid, want in model.items():
        assert ice.content_files(str(tmp), snapshot_id=sid) == want
    # default = latest
    assert ice.content_files(str(tmp)) == model[len(ops)]
    # delta semantics: files of snapshots strictly after a cut
    for cut in range(len(ops) + 1):
        want_delta = [
            f for e in entries if e["snapshot_id"] > cut for f in e["files"]
        ]
        assert ice.table_files(str(tmp), after_snapshot=cut) == want_delta


def test_missing_table_raises(tmp_path):
    import pytest

    with pytest.raises(FileNotFoundError):
        ice.content_files(str(tmp_path / "nope"))
