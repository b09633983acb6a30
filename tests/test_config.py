import pytest

from target_hdfs_spark.config import TargetConfig, convert_size_to_bytes


def test_size_units():
    assert convert_size_to_bytes("200M") == 200 * 1024 * 1024
    assert convert_size_to_bytes("2k") == 2048
    assert convert_size_to_bytes("1G") == 1 << 30
    assert convert_size_to_bytes("10KB") == 10240


def test_size_unitless_accepted():
    # the reference crashes on unit-less sizes (utils/__init__.py:19-20
    # raises on the branch its own regex admits); we accept plain bytes
    assert convert_size_to_bytes("800") == 800
    assert convert_size_to_bytes(800) == 800


@pytest.mark.parametrize("bad", ["", "abc", "12X", "-5", -5])
def test_size_invalid(bad):
    with pytest.raises(ValueError):
        convert_size_to_bytes(bad)


def test_config_from_reference_style_dict(tmp_path):
    cfg = TargetConfig.from_dict(
        {
            "hdfs_destination_path": str(tmp_path),
            "hdfs_block_size_limit": "1M",
            "skip_existing_files": True,
            "compression_method": "snappy",
            "partition_cols": "col1,col2",
            "extra_fields": "env=prod,region=eu",
            "extra_fields_types": "env=string,region=string",
            "max_batch_size": 500,
        }
    )
    assert cfg.block_size_limit == 1 << 20
    assert cfg.partition_cols == ("col1", "col2")
    assert cfg.extra_fields == {"env": "prod", "region": "eu"}
    assert cfg.stream_path("users") == f"{tmp_path}/users"


def test_config_requires_destination():
    with pytest.raises(ValueError, match="destination_path"):
        TargetConfig(destination_path="")


def test_config_rejects_unknown_compression():
    with pytest.raises(ValueError, match="compression"):
        TargetConfig(destination_path="/x", compression="lz77")


def test_config_rejects_orphan_extra_type():
    with pytest.raises(ValueError, match="extra_fields_types"):
        TargetConfig(destination_path="/x", extra_fields_types={"ghost": "string"})
