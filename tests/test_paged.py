"""Paged-KV continuous batching (engine/paged.py + ops/kernels/paged_attention):
token parity with the dense engine, page lifecycle, stall/resume, kernel parity.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mingunivision_tpu.config import tiny_llm_config
from mingunivision_tpu.engine.batch_engine import ContinuousBatchingEngine
from mingunivision_tpu.engine.paged import PagedBatchingEngine
from mingunivision_tpu.models.bailing_moe import init_bailing_moe_params


@pytest.fixture(scope="module")
def llm():
    cfg = tiny_llm_config()
    params = init_bailing_moe_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    return cfg, params


def _run_both(cfg, params, requests, *, slots=3, max_len=256, page=32, num_pages=None, seed=0, interleave=False):
    """Drive dense + paged engines through the same admission/step schedule."""
    dense = ContinuousBatchingEngine(params, cfg, slots=slots, max_len=max_len, dtype=jnp.float32, seed=seed)
    paged = PagedBatchingEngine(
        params, cfg, slots=slots, max_len=max_len, page_size=page,
        num_pages=num_pages, dtype=jnp.float32, seed=seed,
    )
    reqs_d, reqs_p = [], []
    for i, (ids, n, kw) in enumerate(requests):
        reqs_d.append(dense.add_request(ids, n, **kw))
        reqs_p.append(paged.add_request(ids, n, **kw))
        if interleave:  # admit mid-flight: a couple of steps between admissions
            for _ in range(2):
                dense.step()
                paged.step()
    dense.run_to_completion(max_steps=64)
    paged.run_to_completion(max_steps=64)
    return reqs_d, reqs_p


class TestPagedParity:
    def test_tokens_match_dense_engine(self, llm):
        cfg, params = llm
        rng = np.random.default_rng(0)
        requests = [
            (rng.integers(0, 400, (6,)), 8, {}),
            (rng.integers(0, 400, (33,)), 10, {}),  # prompt crosses a page boundary
            (rng.integers(0, 400, (12,)), 6, {"do_sample": True, "temperature": 0.7, "top_k": 5}),
        ]
        reqs_d, reqs_p = _run_both(cfg, params, requests, page=32)
        for rd, rp in zip(reqs_d, reqs_p):
            assert rp.done
            assert rp.tokens == rd.tokens  # bit-identical, greedy AND sampled

    def test_tokens_match_with_midflight_admission(self, llm):
        cfg, params = llm
        rng = np.random.default_rng(1)
        requests = [
            (rng.integers(0, 400, (40,)), 8, {}),
            (rng.integers(0, 400, (5,)), 8, {}),
            (rng.integers(0, 400, (17,)), 8, {}),
        ]
        reqs_d, reqs_p = _run_both(cfg, params, requests, page=32, interleave=True)
        for rd, rp in zip(reqs_d, reqs_p):
            assert rp.tokens == rd.tokens

    def test_generation_crosses_page_boundary(self, llm):
        """Lazy growth: the decode stream itself must allocate new pages."""
        cfg, params = llm
        rng = np.random.default_rng(2)
        ids = rng.integers(0, 400, (30,))  # page 32: decode writes 30..45 span 2 pages
        reqs_d, reqs_p = _run_both(cfg, params, [(ids, 16, {})], page=32)
        assert reqs_p[0].tokens == reqs_d[0].tokens
        assert len(reqs_p[0].tokens) == len(reqs_d[0].tokens)


class TestPageLifecycle:
    def test_pages_released_and_reused(self, llm):
        cfg, params = llm
        eng = PagedBatchingEngine(
            params, cfg, slots=2, max_len=128, page_size=32, num_pages=4, dtype=jnp.float32
        )
        rng = np.random.default_rng(3)
        r1 = eng.add_request(rng.integers(0, 400, (40,)), 4)  # 2 pages
        assert r1 is not None
        avail_mid = eng.allocator.available
        eng.run_to_completion()
        assert r1.done
        assert eng.allocator.available == 4  # all pages back
        assert avail_mid < 4
        # pool fully reusable
        r2 = eng.add_request(rng.integers(0, 400, (100,)), 4)  # 4 pages
        assert r2 is not None
        eng.run_to_completion()
        assert r2.done and eng.allocator.available == 4

    def test_admission_rejected_when_pool_exhausted(self, llm):
        cfg, params = llm
        eng = PagedBatchingEngine(
            params, cfg, slots=3, max_len=128, page_size=32, num_pages=3, dtype=jnp.float32
        )
        rng = np.random.default_rng(4)
        r1 = eng.add_request(rng.integers(0, 400, (60,)), 4)  # needs 2 pages
        assert r1 is not None
        r2 = eng.add_request(rng.integers(0, 400, (60,)), 4)  # needs 2, only 1 left
        assert r2 is None
        eng.run_to_completion()
        r3 = eng.add_request(rng.integers(0, 400, (60,)), 4)  # pages are back
        assert r3 is not None

    def test_stall_and_resume_on_page_exhaustion(self, llm):
        """A slot whose next write needs an unavailable page stalls (emits
        nothing) and resumes bit-identically once pages free up."""
        cfg, params = llm
        rng = np.random.default_rng(5)
        ids_long = rng.integers(0, 400, (31,))  # 1 page (32), next write pos 31
        ids_other = rng.integers(0, 400, (60,))  # 2 pages

        # oracle: same request alone with ample pages
        solo = PagedBatchingEngine(params, cfg, slots=1, max_len=128, page_size=32,
                                   num_pages=4, dtype=jnp.float32, seed=7)
        rs = solo.add_request(ids_long, 8)
        solo.run_to_completion()

        eng = PagedBatchingEngine(params, cfg, slots=2, max_len=128, page_size=32,
                                  num_pages=3, dtype=jnp.float32, seed=7)
        r1 = eng.add_request(ids_long, 8)  # takes 1 page
        # r2 holds the other 2 pages for 2 more steps — r1 needs its 2nd page
        # at its 2nd step (write pos 32), while the allocator is still empty
        r2 = eng.add_request(ids_other, 3)
        assert r1 is not None and r2 is not None
        # r1's write crosses into page 2 at pos 32 (after 1 decode token):
        # with 0 free pages it must stall until r2 finishes
        stalled_seen = False
        for _ in range(40):
            eng.step()
            if eng.stalled.get(0):
                stalled_seen = True
            if not eng.slot_req:
                break
        assert stalled_seen
        assert r1.done and r2.done
        assert r1.tokens == rs.tokens  # stall/resume didn't perturb the stream


class TestPrefixCache:
    """Automatic prefix caching (vLLM APC analog): compute skip, sharing
    safety, refcounted retention, eviction under pressure."""

    def _engine(self, llm, **kw):
        cfg, params = llm
        kw.setdefault("slots", 3)
        kw.setdefault("max_len", 256)
        kw.setdefault("page_size", 32)
        kw.setdefault("dtype", jnp.float32)
        return PagedBatchingEngine(params, cfg, prefix_cache=True, **kw)

    def test_hit_tokens_match_cold_run(self, llm):
        """Same prompt twice: the second admission must skip the cached full
        pages AND emit the same greedy tokens as the cold run."""
        cfg, params = llm
        rng = np.random.default_rng(10)
        ids = rng.integers(0, 400, (70,))  # 2 full pages + partial (page 32)
        eng = self._engine(llm, num_pages=12)
        r1 = eng.add_request(ids, 8)
        eng.run_to_completion()
        assert eng.prefix_hit_tokens == 0 and eng.prefix.cached_pages == 2
        r2 = eng.add_request(ids, 8)
        eng.run_to_completion()
        assert eng.prefix_hit_tokens == 64  # both full pages reused
        assert r2.tokens == r1.tokens

    def test_partial_prefix_hit(self, llm):
        """A prompt sharing only the first page reuses exactly that page."""
        cfg, params = llm
        rng = np.random.default_rng(11)
        a = rng.integers(0, 400, (70,))
        b = np.concatenate([a[:32], rng.integers(0, 400, (38,))])
        eng = self._engine(llm, num_pages=12)
        eng.add_request(a, 4)
        eng.run_to_completion()
        rb = eng.add_request(b, 4)
        eng.run_to_completion()
        assert eng.prefix_hit_tokens == 32
        # oracle: same request in a prefix-cache-free engine
        solo = PagedBatchingEngine(params, cfg, slots=1, max_len=256, page_size=32,
                                   num_pages=12, dtype=jnp.float32)
        rs = solo.add_request(b, 4)
        solo.run_to_completion()
        assert rb.tokens == rs.tokens

    def test_fully_paged_prompt_recomputes_last_page(self, llm):
        """T a multiple of page with every page cached: the last page must be
        recomputed (the sampler needs the final position's logits)."""
        cfg, params = llm
        rng = np.random.default_rng(12)
        ids = rng.integers(0, 400, (64,))  # exactly 2 pages
        eng = self._engine(llm, num_pages=12)
        r1 = eng.add_request(ids, 4)
        eng.run_to_completion()
        r2 = eng.add_request(ids, 4)
        eng.run_to_completion()
        assert eng.prefix_hit_tokens == 32  # only page 0 skipped
        assert r2.tokens == r1.tokens

    def test_concurrent_sharing_is_read_only(self, llm):
        """Two live slots sharing prefix pages with different suffixes: both
        match their solo oracles (shared pages never corrupted by decode)."""
        cfg, params = llm
        rng = np.random.default_rng(13)
        common = rng.integers(0, 400, (32,))
        a = np.concatenate([common, rng.integers(0, 400, (10,))])
        b = np.concatenate([common, rng.integers(0, 400, (20,))])

        def solo(ids):
            e = PagedBatchingEngine(params, cfg, slots=1, max_len=256, page_size=32,
                                    num_pages=12, dtype=jnp.float32, seed=3)
            r = e.add_request(ids, 8)
            e.run_to_completion()
            return r.tokens

        want_a, want_b = solo(a), solo(b)
        eng = self._engine(llm, num_pages=12, seed=3)
        ra = eng.add_request(a, 8)
        rb = eng.add_request(b, 8)  # admitted while ra is mid-flight
        assert eng.prefix_hit_tokens == 32
        assert eng.prefix.ref[eng.slot_pages[0][0]] == 2  # page 0 shared
        eng.run_to_completion()
        assert ra.tokens == want_a and rb.tokens == want_b

    def test_cached_pages_evicted_under_pressure(self, llm):
        """Refcount-0 cached pages are reclaimed LRU-first when the free list
        runs dry — admission succeeds where a retained-forever policy would
        reject, and correctness is unaffected."""
        cfg, params = llm
        rng = np.random.default_rng(14)
        eng = self._engine(llm, num_pages=4, max_len=128)
        r1 = eng.add_request(rng.integers(0, 400, (70,)), 4)  # 3 pages, 2 cached after
        assert r1 is not None
        eng.run_to_completion()
        assert eng.prefix.cached_pages == 2 and eng.allocator.available == 2
        old_hashes = set(eng.prefix.hash_to_page)
        # needs 4 pages: must evict both cached pages to fit
        r2 = eng.add_request(rng.integers(0, 400, (100,)), 4)
        assert r2 is not None
        assert not old_hashes & set(eng.prefix.hash_to_page)  # both evicted
        eng.run_to_completion()
        assert r2.done

    def test_hit_respects_per_request_sampling(self, llm):
        """A sampled request over a cached prefix draws from the same stream
        as its cold twin (prefix reuse must not perturb sampling)."""
        cfg, params = llm
        rng = np.random.default_rng(15)
        ids = rng.integers(0, 400, (40,))
        kw = dict(do_sample=True, temperature=0.8, top_k=7)
        eng = self._engine(llm, num_pages=12, seed=11)
        r1 = eng.add_request(ids, 6, **kw)
        eng.run_to_completion()
        cold = PagedBatchingEngine(params, cfg, slots=3, max_len=256, page_size=32,
                                   num_pages=12, dtype=jnp.float32, seed=11)
        c1 = cold.add_request(ids, 6, **kw)
        cold.run_to_completion()
        c2 = cold.add_request(ids, 6, **kw)
        cold.run_to_completion()
        r2 = eng.add_request(ids, 6, **kw)  # hit
        eng.run_to_completion()
        assert r1.tokens == c1.tokens
        assert r2.tokens == c2.tokens  # same key schedule, hit == cold

    def test_hit_near_max_len_keeps_prefix_intact(self, llm):
        """Regression (ADVICE r3): with page_size=32 the cached prefix Tc is
        not PREFILL_BUCKET-aligned; for T within one bucket of max_len an
        uncapped padded suffix (Tc + 64 > max_len) would make the append
        prefill clamp its dynamic_update_slice start and silently overwrite
        the gathered prefix KV. Tokens must match the cold run exactly."""
        cfg, params = llm
        rng = np.random.default_rng(16)
        ids = rng.integers(0, 400, (250,))  # 7 full pages (Tc=224), Ts=26
        eng = self._engine(llm, num_pages=24, max_len=256)
        r1 = eng.add_request(ids, 4)
        eng.run_to_completion()
        assert eng.prefix.cached_pages == 7
        r2 = eng.add_request(ids, 4)  # hit: Tc=224, padded suffix must fit in 32
        eng.run_to_completion()
        assert eng.prefix_hit_tokens == 224
        assert r2.tokens == r1.tokens

    def test_impossible_alloc_does_not_purge_prefix_cache(self, llm):
        """Regression (ADVICE r3): an allocation that cannot succeed even after
        evicting every refcount-0 cached page must evict NOTHING."""
        cfg, params = llm
        rng = np.random.default_rng(17)
        eng = self._engine(llm, num_pages=4, max_len=128)
        r1 = eng.add_request(rng.integers(0, 400, (70,)), 4)  # 3 pages, 2 cached after
        assert r1 is not None
        eng.run_to_completion()
        assert eng.prefix.cached_pages == 2
        before = set(eng.prefix.hash_to_page)
        assert eng._alloc(8) is None  # > available + evictable: must bail early
        assert set(eng.prefix.hash_to_page) == before  # cache untouched
        assert eng.prefix.cached_pages == 2


class TestPagedAttentionKernel:
    def _setup(self, key, B=3, Hq=4, Hkv=2, D=8, page=16, P=6, maxp=4):
        ks = jax.random.split(key, 4)
        q = jax.random.normal(ks[0], (B, 1, Hq, D), jnp.float32)
        kp = jax.random.normal(ks[1], (Hkv, P + 1, page, D), jnp.float32)
        vp = jax.random.normal(ks[2], (Hkv, P + 1, page, D), jnp.float32)
        # rows own disjoint pages; unassigned entries point at the scratch page
        tables = np.full((B, maxp), P, np.int32)
        tables[0, :2] = [0, 1]
        tables[1, :3] = [2, 3, 4]
        tables[2, :1] = [5]
        lengths = np.asarray([20, 41, 7], np.int32)
        return q, kp, vp, jnp.asarray(tables), jnp.asarray(lengths)

    def test_gather_path_matches_dense_mha(self):
        from mingunivision_tpu.ops.attention import mha
        from mingunivision_tpu.ops.kernels.paged_attention import paged_gather_attention

        q, kp, vp, tables, lengths = self._setup(jax.random.PRNGKey(0))
        out = paged_gather_attention(q, kp, vp, tables, lengths)
        # dense oracle: materialize each row's contiguous cache
        B, _, Hq, D = q.shape
        Hkv, _, page, _ = kp.shape
        maxp = tables.shape[1]
        kg = jnp.take(kp, tables, axis=1).transpose(1, 0, 2, 3, 4).reshape(B, Hkv, maxp * page, D)
        vg = jnp.take(vp, tables, axis=1).transpose(1, 0, 2, 3, 4).reshape(B, Hkv, maxp * page, D)
        mask = jnp.arange(maxp * page)[None, :] < lengths[:, None]
        want = mha(q, kg, vg, mask=mask[:, None, None, :], kv_head_major=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=1e-6)

    def test_pallas_interpret_matches_gather(self):
        from mingunivision_tpu.ops.kernels.paged_attention import (
            paged_gather_attention,
            pallas_paged_decode_attention,
        )

        q, kp, vp, tables, lengths = self._setup(jax.random.PRNGKey(1))
        want = paged_gather_attention(q, kp, vp, tables, lengths)
        got = pallas_paged_decode_attention(q, kp, vp, tables, lengths, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-6)

    def test_scratch_page_contents_never_leak(self):
        """Garbage on the scratch page (or any masked page) must not change
        the output — only positions < length contribute."""
        from mingunivision_tpu.ops.kernels.paged_attention import paged_gather_attention

        q, kp, vp, tables, lengths = self._setup(jax.random.PRNGKey(2))
        out1 = paged_gather_attention(q, kp, vp, tables, lengths)
        P = kp.shape[1] - 1
        kp2 = kp.at[:, P].set(1e6)  # poison scratch
        vp2 = vp.at[:, P].set(-1e6)
        # poison the tail of row 0's LAST page past its length (20 < 32)
        kp2 = kp2.at[:, 1, 10:].set(3e5)
        vp2 = vp2.at[:, 1, 10:].set(-3e5)
        out2 = paged_gather_attention(q, kp2, vp2, tables, lengths)
        np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
