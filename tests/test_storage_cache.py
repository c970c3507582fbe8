"""FileCacheManager / CachedStorage / storage provider selection tests
(reference seams: FileCacheManager in fast_multivector_store.py:69-292,
S3Storage in core/storage/s3_storage.py)."""

import asyncio

from conftest import run_once

import pytest

from morphik_core_tpu.config import Settings
from morphik_core_tpu.services_init import build_storage
from morphik_core_tpu.storage.cache_manager import CachedStorage, FileCacheManager
from morphik_core_tpu.storage.local_storage import LocalStorage


def run(coro):
    return run_once(coro)


def test_cache_put_get_evict(tmp_path):
    cache = FileCacheManager(tmp_path / "cache", max_bytes=100)
    cache.put("b", "k1", b"x" * 40)
    cache.put("b", "k2", b"y" * 40)
    assert cache.get("b", "k1") == b"x" * 40
    # k2 is now least-recently-used; adding k3 must evict it
    cache.put("b", "k3", b"z" * 40)
    assert cache.get("b", "k2") is None
    assert cache.get("b", "k1") == b"x" * 40
    assert cache.get("b", "k3") == b"z" * 40
    assert cache.total_bytes <= 100


def test_cache_oversized_item_skipped(tmp_path):
    cache = FileCacheManager(tmp_path / "cache", max_bytes=10)
    cache.put("b", "big", b"x" * 50)
    assert cache.get("b", "big") is None


def test_cache_survives_restart(tmp_path):
    c1 = FileCacheManager(tmp_path / "cache", max_bytes=1000)
    c1.put("b", "k", b"persisted")
    c2 = FileCacheManager(tmp_path / "cache", max_bytes=1000)
    assert c2.get("b", "k") == b"persisted"
    assert c2.total_bytes == len(b"persisted")


def test_cache_path_escape_rejected(tmp_path):
    cache = FileCacheManager(tmp_path / "cache", max_bytes=1000)
    with pytest.raises(ValueError):
        cache.put("b", "../../etc/passwd", b"nope")


class CountingStorage(LocalStorage):
    def __init__(self, root):
        super().__init__(root)
        self.downloads = 0

    async def download_file(self, bucket, key):
        self.downloads += 1
        return await super().download_file(bucket, key)


def test_cached_storage_write_through_and_hit(tmp_path):
    inner = CountingStorage(tmp_path / "store")
    cache = FileCacheManager(tmp_path / "cache", max_bytes=1 << 20)
    s = CachedStorage(inner, cache)

    async def go():
        await s.upload_file(b"hello", "a/b.txt", bucket="bk")
        assert await s.download_file("bk", "a/b.txt") == b"hello"
        assert inner.downloads == 0  # served from write-through cache
        cache.invalidate("bk", "a/b.txt")
        assert await s.download_file("bk", "a/b.txt") == b"hello"
        assert inner.downloads == 1  # miss -> inner, then re-cached
        assert await s.download_file("bk", "a/b.txt") == b"hello"
        assert inner.downloads == 1
        await s.delete_file("bk", "a/b.txt")
        assert cache.get("bk", "a/b.txt") is None

    run(go())


def test_build_storage_local_default(tmp_path):
    settings = Settings.model_validate({"storage": {"storage_path": str(tmp_path / "s")}})
    st = build_storage(settings)
    assert isinstance(st, LocalStorage)


def test_s3_storage_requires_boto3():
    try:
        import boto3  # noqa: F401

        pytest.skip("boto3 present; gating path not exercised")
    except ImportError:
        pass
    from morphik_core_tpu.storage.s3_storage import S3Storage

    with pytest.raises(RuntimeError):
        S3Storage("bucket")


def test_s3_storage_with_stub_boto3(monkeypatch, tmp_path):
    """Exercise S3Storage logic against an in-memory fake boto3 client
    (boto3 is absent from this image; the wire logic still needs tests)."""
    import sys
    import types

    store_data = {}

    class FakeBody:
        def __init__(self, b):
            self._b = b

        def read(self):
            return self._b

    class FakeClient:
        def put_object(self, Bucket, Key, Body, **kw):
            store_data[(Bucket, Key)] = (Body, kw.get("ContentType"))

        def get_object(self, Bucket, Key):
            return {"Body": FakeBody(store_data[(Bucket, Key)][0])}

        def generate_presigned_url(self, op, Params, ExpiresIn):
            return f"https://fake/{Params['Bucket']}/{Params['Key']}?exp={ExpiresIn}"

        def delete_object(self, Bucket, Key):
            store_data.pop((Bucket, Key), None)

        def head_object(self, Bucket, Key):
            if (Bucket, Key) not in store_data:
                raise KeyError(Key)
            return {"ContentLength": len(store_data[(Bucket, Key)][0])}

    fake_boto3 = types.ModuleType("boto3")
    fake_boto3.client = lambda *a, **kw: FakeClient()
    monkeypatch.setitem(sys.modules, "boto3", fake_boto3)

    from morphik_core_tpu.storage.s3_storage import S3Storage

    s3 = S3Storage("default-bucket", upload_concurrency=2)

    async def go():
        b, k = await s3.upload_file(b"payload", "a/b.bin", "application/octet-stream")
        assert (b, k) == ("default-bucket", "a/b.bin")
        assert await s3.download_file("", "a/b.bin") == b"payload"
        url = await s3.get_download_url("", "a/b.bin", expires_in=60)
        assert url == "https://fake/default-bucket/a/b.bin?exp=60"
        assert await s3.get_object_size("", "a/b.bin") == 7
        assert await s3.delete_file("", "a/b.bin") is True
        assert await s3.get_object_size("", "a/b.bin") is None
        # base64 path + explicit bucket
        from morphik_core_tpu.utils.fast_ops import encode_base64

        await s3.upload_from_base64(encode_base64(b"x"), "c.txt", bucket="other")
        assert await s3.download_file("other", "c.txt") == b"x"

    run(go())


def test_cached_s3_composition(monkeypatch, tmp_path):
    """build_storage wires CachedStorage around S3 when configured."""
    import sys
    import types

    fake_boto3 = types.ModuleType("boto3")
    fake_boto3.client = lambda *a, **kw: object()
    monkeypatch.setitem(sys.modules, "boto3", fake_boto3)

    from morphik_core_tpu.config import Settings
    from morphik_core_tpu.services_init import build_storage
    from morphik_core_tpu.storage.cache_manager import CachedStorage

    settings = Settings.model_validate(
        {"storage": {"provider": "aws-s3", "bucket_name": "bk",
                      "cache_path": str(tmp_path / "cache"),
                      "storage_path": str(tmp_path / "s")}}
    )
    st = build_storage(settings)
    assert isinstance(st, CachedStorage)


def test_storage_path_traversal_blocked(tmp_path):
    """Regression: startswith-based containment accepted escapes into
    sibling dirs sharing the root's name as a prefix."""
    import asyncio

    from morphik_core_tpu.storage.local_storage import LocalStorage

    run = run_once
    (tmp_path / "store-secrets").mkdir()
    st = LocalStorage(tmp_path / "store")
    with pytest.raises(ValueError):
        run(st.upload_file(b"x", "../store-secrets/leak"))
    with pytest.raises(ValueError):
        run(st.upload_file(b"x", "../../etc/passwd"))
    # normal nested keys still work
    run(st.upload_file(b"ok", "a/b/c.bin"))
    assert run(st.download_file("", "a/b/c.bin")) == b"ok"
    assert not (tmp_path / "store-secrets" / "leak").exists()


def test_cache_path_traversal_blocked(tmp_path):
    from morphik_core_tpu.storage.cache_manager import FileCacheManager

    (tmp_path / "cache2").mkdir()
    cm = FileCacheManager(tmp_path / "cache")
    with pytest.raises(ValueError):
        cm.put("", "../cache2/esc", b"x")
    cm.put("", "fine", b"ok")
    assert cm.get("", "fine") == b"ok"


def test_cache_put_is_atomic_and_seed_skips_tmp(tmp_path):
    from morphik_core_tpu.storage.cache_manager import FileCacheManager

    cm = FileCacheManager(tmp_path / "c")
    cm.put("b", "k1", b"data1")
    # a leftover .tmp (crash artifact) must not be seeded as an entry
    (tmp_path / "c" / "b" / "junk.tmp").write_bytes(b"partial")
    cm2 = FileCacheManager(tmp_path / "c")
    assert cm2.get("b", "k1") == b"data1"
    assert cm2.get("b", "junk.tmp") is None
