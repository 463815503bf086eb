"""End-to-end image payload invariants (BASELINE.json input_hint): each
crawled image row must satisfy decoded-pixel equality (lossless) or
PSNR>=40dB (lossy) plus caption equality against the independently
regenerated reference image."""

import shutil
import tempfile

from fundcrawler_spark import fixtures as fx
from fundcrawler_spark.functions import imaging
from fundcrawler_spark.plans.wave_loop import Crawler, CrawlConfig
from fundcrawler_spark.schemas import PAGE_ORDINAL, SEEDS_SCHEMA
from fundcrawler_spark.sources.stub_transport import FMTS


def test_crawled_images_match_reference(spark):
    seeds = spark.createDataFrame(fx.seed_rows(6), SEEDS_SCHEMA)
    wd = tempfile.mkdtemp(prefix="imgs_")
    try:
        cfg = CrawlConfig(fail_rate=0.0, max_waves=30, n_shards=4, init_budget=40.0)
        c = Crawler(spark, wd, cfg)
        stats = c.run(seeds=seeds, log=lambda *a: None)
        assert stats["pages_fetched"] == 24

        imgs = c.images.read(spark)
        rows = imgs.collect()
        assert len(rows) == 24
        for r in rows:
            image_id = r["image_id"]
            _, seed_s, ord_s = image_id.split("_")
            seed_index, page_ordinal = int(seed_s), int(ord_s)
            expected_fmt = FMTS[(seed_index + page_ordinal) % len(FMTS)]
            assert r["fmt"] == expected_fmt
            ref = fx.make_image(image_id, 32 + (page_ordinal % 4) * 16, 48)
            got = imaging.decode_image(bytes(r["bytes"]), r["fmt"])
            assert (got.shape[0], got.shape[1]) == (r["h"], r["w"])
            if r["fmt"] in imaging.LOSSLESS:
                assert (got == ref).all(), image_id
                assert r["phash"] == imaging.phash64(ref)
            else:
                assert imaging.psnr(ref, got) >= 40.0, image_id
            assert r["caption"] == fx.caption_for(image_id)
    finally:
        shutil.rmtree(wd)
