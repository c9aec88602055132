"""Transfer service logic with fake clients (reference: tests for
transfer_baltrad with mocked SFTP/S3)."""

from vptstools_spark.operators.transfer import (
    ErrorNotifier,
    parse_transfer_name,
    plan_transfer,
    run_transfer,
)

LISTING = [
    "fropo_vp_20220809T051000Z_0xb",
    "fropo_vp_20220809T053000Z_0xb",
    "fropo_pvol_20220809T051000Z_0xb",  # not a VP file → filtered (F3)
    "badname.txt",
    "fropo_vp_20220810T051000Z_0xb",
]


def test_parse_transfer_name():
    item = parse_transfer_name("fropo_vp_20220809T051000Z_0xb")
    assert (item.radar_code, item.year, item.month, item.day) == ("fropo", "2022", "08", "09")
    assert item.destination_key == "fropo/2022/08/09/fropo_vp_20220809T051000Z_0xb"
    assert parse_transfer_name("nope") is None


def test_plan_transfer_anti_join():
    existing = {"fropo/2022/08/09/fropo_vp_20220809T051000Z_0xb"}
    plan = plan_transfer(LISTING, lambda k: k in existing)
    names = [i.file_name for i in plan]
    # pvol + badname filtered; already-present key anti-joined away
    assert names == ["fropo_vp_20220809T053000Z_0xb", "fropo_vp_20220810T051000Z_0xb"]


def test_run_transfer_error_isolation():
    store: dict[str, bytes] = {}

    def download(name: str) -> bytes:
        if name == "fropo_vp_20220810T051000Z_0xb":
            raise OSError("network blip")
        return b"data-" + name.encode()

    notifier = ErrorNotifier()
    uploaded, failed = run_transfer(
        LISTING, lambda k: False, download, lambda k, b: store.__setitem__(k, b), notifier
    )
    assert (uploaded, failed) == (2, 1)
    assert len(store) == 2
    assert len(notifier.errors) == 1
    assert "OSError" in notifier.errors[0][1]


def test_notifier_publishes():
    sent = []
    n = ErrorNotifier(lambda s, m: sent.append((s, m)))
    n("daily job", ValueError("boom"))
    assert sent and "daily job" in sent[0][0]
