/*
 * fast_astar_mt.c — native multithreaded HDA* engine (shared-memory).
 *
 * The honest apples-to-apples CPU baseline: the reference is a
 * multi-threaded MPI program (ref: pastar/PAStar.cpp:643-654 spawns
 * hardware_concurrency() workers; per-thread open/closed shards at
 * pastar/PAStar.cpp:91-92; lock-protected inboxes at :99-101; sum/z-order
 * owner hash at pastar/CoordHash.cpp:38-44).  This file reproduces that
 * architecture natively: T workers, per-worker open/closed shards, a
 * sum-hash owner function, mutex-protected inbox queues with batched
 * hand-off, and quiescence-based termination on the global f-bound —
 * the shared-memory collapse of the reference's two-phase check_stop
 * (pastar/PAStar.cpp:480-547): with atomic sent/received counters,
 * "all workers idle && sent == received && min open f >= candidate g"
 * is exactly the fixed point the reference's flush + double-Allreduce
 * establishes.
 *
 * Reuses the map/heap/expansion machinery from fast_astar.c (textually
 * included; both entry points are exported from this .so).
 *
 * Build: gcc -O3 -march=native -shared -fPIC -pthread fast_astar_mt.c \
 *            -o libfastastar_mt.so
 */
#include "fast_astar.c"

#include <pthread.h>
#include <stdatomic.h>
#include <time.h>

#define MSG_BATCH 256

/* MT open list: min-f with a larger-g tie-break.  On equal-f plateaus
   plain f-order makes the gated workers race breadth-first through the
   plateau while the goal waits in one heap (PF08184: 60 serial expansions
   vs ~17k without the tie-break); preferring deeper nodes reaches goals
   depth-first like a good serial tie-break would. */
typedef struct {
    int32_t f;
    int32_t negg; /* -g: smaller = deeper = preferred */
    uint32_t idx;
} MtHeapItem;

typedef struct {
    MtHeapItem *items;
    uint32_t len, cap;
} MtHeap;

static inline int mt_before(const MtHeapItem *a, const MtHeapItem *b)
{
    return a->f < b->f || (a->f == b->f && a->negg < b->negg);
}

static int mt_heap_push(MtHeap *hp, int32_t f, int32_t g, uint32_t idx)
{
    if (hp->len == hp->cap) {
        hp->cap *= 2;
        MtHeapItem *ni = realloc(hp->items,
                                 (size_t)hp->cap * sizeof(MtHeapItem));
        if (!ni) return -1;
        hp->items = ni;
    }
    MtHeapItem it = {f, -g, idx};
    uint32_t i = hp->len++;
    while (i > 0) {
        uint32_t p = (i - 1) / 2;
        if (!mt_before(&it, &hp->items[p])) break;
        hp->items[i] = hp->items[p];
        i = p;
    }
    hp->items[i] = it;
    return 0;
}

static int mt_heap_pop(MtHeap *hp, MtHeapItem *out)
{
    if (hp->len == 0) return -1;
    *out = hp->items[0];
    MtHeapItem last = hp->items[--hp->len];
    uint32_t i = 0;
    for (;;) {
        uint32_t c = 2 * i + 1;
        if (c >= hp->len) break;
        if (c + 1 < hp->len && mt_before(&hp->items[c + 1], &hp->items[c]))
            c++;
        if (!mt_before(&hp->items[c], &last)) break;
        hp->items[i] = hp->items[c];
        i = c;
    }
    hp->items[i] = last;
    return 0;
}

typedef struct {
    uint32_t key[MAX_W];
    int32_t g;
    int32_t h;
    int32_t parenti;
} Msg;

typedef struct {
    Msg *items;
    _Atomic uint32_t len; /* atomic: read lock-free in the idle wait loop */
    uint32_t cap;
    pthread_mutex_t mu;
} Inbox;

typedef struct MtShared MtShared;

typedef struct {
    int tid;
    MtShared *sh;
    Map map;
    MtHeap heap;
    Inbox inbox;
    /* per-destination outgoing batches (flushed at MSG_BATCH or idle) */
    Msg *out;        /* T * MSG_BATCH */
    uint32_t *out_len; /* T */
    int64_t expanded, reopened;
    int oom;
    /* this worker's current open-list min f, for the global f-gate */
    _Atomic int32_t cur_min_f;
} MtWorker;

struct MtShared {
    int n, n_pairs, W, T, M;
    const uint16_t *final_coord;
    const uint8_t *seqs;
    int enc_stride;
    const int32_t *cost_table;
    const int32_t *pair_x, *pair_y, *pair_w;
    const int32_t *tables;
    int S;
    int gap_open, gap_ext, gap_gap;
    int generic_gaps;
    int hash_shift;
    uint32_t goal_key[MAX_W];
    /* per-mask precompute (shared, read-only after init) */
    int *both_cnt;
    int32_t *both_pairs;
    int32_t *const_part;
    MtWorker *workers;
    /* termination state */
    _Atomic int32_t best_goal_g;   /* candidate bound (INT32_MAX if none) */
    _Atomic int64_t sent, recvd;   /* cross-worker node messages */
    pthread_mutex_t term_mu;
    pthread_cond_t term_cv;
    int idle_count;
    _Atomic int done; /* atomic: also polled lock-free in the f-gated branch */
};

static inline int mt_owner(const uint16_t *coord, int n, int shift, int T)
{
    /* reference FSUM strategy: (sum(coords) >> shift) % size
       (ref: pastar/CoordHash.cpp:38-44) */
    uint64_t s = 0;
    for (int i = 0; i < n; i++) s += coord[i];
    return (int)((s >> shift) % (uint32_t)T);
}

static void mt_wake(MtShared *sh)
{
    pthread_mutex_lock(&sh->term_mu);
    pthread_cond_broadcast(&sh->term_cv);
    pthread_mutex_unlock(&sh->term_mu);
}

static int mt_flush_dest(MtWorker *w, int dest)
{
    MtShared *sh = w->sh;
    uint32_t cnt = w->out_len[dest];
    if (!cnt) return 0;
    Inbox *ib = &sh->workers[dest].inbox;
    pthread_mutex_lock(&ib->mu);
    if (ib->len + cnt > ib->cap) {
        uint32_t ncap = ib->cap;
        while (ib->len + cnt > ncap) ncap *= 2;
        Msg *ni = realloc(ib->items, (size_t)ncap * sizeof(Msg));
        if (!ni) { pthread_mutex_unlock(&ib->mu); return -1; }
        ib->items = ni;
        ib->cap = ncap;
    }
    memcpy(ib->items + ib->len, w->out + (size_t)dest * MSG_BATCH,
           (size_t)cnt * sizeof(Msg));
    ib->len += cnt;
    pthread_mutex_unlock(&ib->mu);
    atomic_fetch_add_explicit(&sh->sent, cnt, memory_order_release);
    w->out_len[dest] = 0;
    mt_wake(sh); /* dest may be idle-waiting */
    return 0;
}

static int mt_flush_all(MtWorker *w)
{
    for (int d = 0; d < w->sh->T; d++)
        if (d != w->tid && mt_flush_dest(w, d)) return -1;
    return 0;
}

/* upsert a (key,g,h,parenti) into the local shard — the reference's
   enqueue dedup + reopen semantics (ref: pastar/PAStar.cpp:219-237) */
static int mt_accept(MtWorker *w, const uint32_t *key, int32_t g, int32_t h,
                     int32_t parenti)
{
    int created;
    Entry *ce = map_upsert(&w->map, key, w->sh->W, &created);
    if (!ce) return -1;
    if (created) {
        ce->g = g;
        ce->h = h;
        ce->f = g + h;
        ce->parenti = parenti;
        ce->state = STATE_OPEN;
        return mt_heap_push(&w->heap, ce->f, ce->g,
                            (uint32_t)(ce - w->map.arena));
    }
    if (ce->state == STATE_CLOSED) {
        if (g < ce->g) {
            ce->g = g;
            ce->f = g + ce->h;
            ce->parenti = parenti;
            ce->state = STATE_OPEN;
            w->reopened++;
            return mt_heap_push(&w->heap, ce->f, ce->g,
                            (uint32_t)(ce - w->map.arena));
        }
        return 0;
    }
    if (g + ce->h < ce->f) { /* open: decrease-key */
        ce->g = g;
        ce->f = g + ce->h;
        ce->parenti = parenti;
        return mt_heap_push(&w->heap, ce->f, ce->g,
                            (uint32_t)(ce - w->map.arena));
    }
    return 0;
}

/* drain the inbox into the local shard; returns node count (or -1) */
static int64_t mt_consume(MtWorker *w, Msg **scratch, uint32_t *scratch_cap)
{
    Inbox *ib = &w->inbox;
    pthread_mutex_lock(&ib->mu);
    uint32_t cnt = ib->len;
    if (!cnt) { pthread_mutex_unlock(&ib->mu); return 0; }
    if (cnt > *scratch_cap) {
        Msg *ns = realloc(*scratch, (size_t)ib->cap * sizeof(Msg));
        if (!ns) { pthread_mutex_unlock(&ib->mu); return -1; }
        *scratch = ns;
        *scratch_cap = ib->cap;
    }
    memcpy(*scratch, ib->items, (size_t)cnt * sizeof(Msg));
    ib->len = 0;
    pthread_mutex_unlock(&ib->mu);
    for (uint32_t i = 0; i < cnt; i++) {
        Msg *m = &(*scratch)[i];
        if (mt_accept(w, m->key, m->g, m->h, m->parenti)) return -1;
    }
    atomic_fetch_add_explicit(&w->sh->recvd, cnt, memory_order_release);
    return cnt;
}

static void *mt_worker_main(void *arg)
{
    MtWorker *w = arg;
    MtShared *sh = w->sh;
    const int n = sh->n, n_pairs = sh->n_pairs, W = sh->W, M = sh->M;
    int32_t mm[MAX_N * MAX_N];
    uint16_t cur[MAX_N], child[MAX_N];
    Msg *scratch = malloc(sizeof(Msg) * 1024);
    uint32_t scratch_cap = scratch ? 1024 : 0;
    if (!scratch) { w->oom = 1; return NULL; }

    for (;;) {
        if (mt_consume(w, &scratch, &scratch_cap) < 0) { w->oom = 1; break; }

        /* pop the best node under the bound */
        int32_t bound = atomic_load_explicit(&sh->best_goal_g,
                                             memory_order_acquire);
        Entry *e = NULL;
        int32_t my_min = INT32_MAX;
        while (w->heap.len) {
            MtHeapItem top = w->heap.items[0];
            Entry *c = &w->map.arena[top.idx];
            if (c->state != STATE_OPEN || c->f != top.f) { /* stale */
                MtHeapItem dead;
                mt_heap_pop(&w->heap, &dead);
                continue;
            }
            my_min = top.f;
            if (top.f >= bound) break; /* quiescent under the bound */
            /* global f-gate: only expand at the global min f.  Pure HDA*
               lets every shard blast through its local queue, which on
               small searches expands orders of magnitude more nodes than
               serial A* (speculation above f*).  Publishing each shard's
               min and expanding only at the global min restores
               best-first order while keeping all shards busy whenever
               min-f ties exist (they almost always do at scale). */
            atomic_store_explicit(&w->cur_min_f, top.f,
                                  memory_order_release);
            int32_t gmin = top.f;
            for (int t = 0; t < sh->T; t++) {
                int32_t o = atomic_load_explicit(
                    &sh->workers[t].cur_min_f, memory_order_acquire);
                if (o < gmin) gmin = o;
            }
            if (top.f > gmin) break; /* someone holds better work: wait */
            MtHeapItem it;
            mt_heap_pop(&w->heap, &it);
            e = c;
            break;
        }
        atomic_store_explicit(&w->cur_min_f, my_min, memory_order_release);

        if (!e && my_min < bound) {
            /* f-gated: real work remains but another shard holds the
               global min — flush so it sees our successors, then poll.
               Must NOT enter the termination consensus (we are not
               quiescent).  Do check done: a worker that OOMs mid-run
               sets done without raising its cur_min_f past our f, and
               without this check we would spin here forever. */
            if (atomic_load_explicit(&sh->done, memory_order_acquire)) break;
            if (mt_flush_all(w)) { w->oom = 1; break; }
            struct timespec ts = {0, 20000}; /* 20 us */
            nanosleep(&ts, NULL);
            continue;
        }

        if (!e) {
            /* nothing under the bound: flush outboxes, then try to agree
               on termination (the check_stop fixed point) */
            if (mt_flush_all(w)) { w->oom = 1; break; }
            pthread_mutex_lock(&sh->term_mu);
            sh->idle_count++;
            for (;;) {
                if (sh->done) break;
                int64_t sent = atomic_load(&sh->sent);
                int64_t recvd = atomic_load(&sh->recvd);
                /* lock-free atomic read; ordered by mt_wake's term_mu
                   acquire/release (the producer bumps len, then takes
                   term_mu to broadcast — our cond_wait reacquiring
                   term_mu gives the happens-before edge that makes the
                   refreshed len visible on the next loop iteration) */
                int inbox_nonempty =
                    atomic_load_explicit(&w->inbox.len,
                                         memory_order_acquire) > 0;
                if (inbox_nonempty) break;
                if (sh->idle_count == sh->T && sent == recvd) {
                    sh->done = 1;
                    pthread_cond_broadcast(&sh->term_cv);
                    break;
                }
                pthread_cond_wait(&sh->term_cv, &sh->term_mu);
            }
            int done = sh->done;
            if (!done) sh->idle_count--;
            pthread_mutex_unlock(&sh->term_mu);
            if (done) break;
            continue;
        }

        e->state = STATE_CLOSED;
        w->expanded++;

        if (!memcmp(e->key, sh->goal_key, (size_t)W * sizeof(uint32_t))) {
            /* goal candidate: tighten the global bound (the reference's
               process_final_node broadcast, pastar/PAStar.cpp:433-451,
               collapses to one atomic min in shared memory) */
            int32_t g = e->g;
            int32_t prev = atomic_load(&sh->best_goal_g);
            while (g < prev &&
                   !atomic_compare_exchange_weak(&sh->best_goal_g, &prev, g))
                ;
            mt_wake(sh);
            continue;
        }

        for (int i = 0; i < n; i++)
            cur[i] = (uint16_t)((e->key[i / 2] >> (16 * (i % 2))) & 0xFFFF);
        int32_t g0 = e->g;
        int32_t parenti = e->parenti;

        for (int p = 0; p < n_pairs; p++) {
            uint8_t a = sh->seqs[(size_t)sh->pair_x[p] * sh->enc_stride +
                                 cur[sh->pair_x[p]]];
            uint8_t b = sh->seqs[(size_t)sh->pair_y[p] * sh->enc_stride +
                                 cur[sh->pair_y[p]]];
            mm[p] = sh->cost_table[(size_t)a * 128 + b];
        }

        for (int m = 1; m <= M; m++) {
            int ok = 1;
            for (int i = 0; i < n; i++) {
                child[i] = cur[i] + (uint16_t)((m >> i) & 1);
                if (child[i] > sh->final_coord[i]) { ok = 0; break; }
            }
            if (!ok) continue;
            int32_t cost = sh->const_part[m];
            const int32_t *bp = &sh->both_pairs[(size_t)m * n_pairs];
            for (int k = 0; k < sh->both_cnt[m]; k++)
                cost += mm[bp[k]] * sh->pair_w[bp[k]];
            if (sh->generic_gaps) {
                cost = 0;
                for (int p = 0; p < n_pairs; p++) {
                    int bx = (m >> sh->pair_x[p]) & 1;
                    int by = (m >> sh->pair_y[p]) & 1;
                    int32_t pc;
                    if (bx && by) pc = mm[p];
                    else if (!bx && !by) pc = sh->gap_gap;
                    else {
                        int s = bx ? sh->pair_y[p] : sh->pair_x[p];
                        pc = (((parenti >> s) & 1) != ((m >> s) & 1))
                                 ? sh->gap_open : sh->gap_ext;
                    }
                    cost += pc * sh->pair_w[p];
                }
            }
            int32_t cg = g0 + cost;
            int32_t ch;
            {
                int64_t acc = 0;
                for (int p = 0; p < n_pairs; p++)
                    acc += (int64_t)sh->pair_w[p] *
                           sh->tables[(size_t)p * sh->S * sh->S +
                                      (size_t)child[sh->pair_x[p]] * sh->S +
                                      child[sh->pair_y[p]]];
                ch = (int32_t)acc;
            }
            /* f >= candidate bound cannot improve the answer: prune the
               edge (safe: h admissible, so any completion costs >= cg+ch) */
            if (cg + ch >= atomic_load_explicit(&sh->best_goal_g,
                                                memory_order_relaxed))
                continue;

            uint32_t ckey[MAX_W];
            pack_key(child, n, W, ckey);
            int dest = mt_owner(child, n, sh->hash_shift, sh->T);
            if (dest == w->tid) {
                if (mt_accept(w, ckey, cg, ch, m)) { w->oom = 1; goto out; }
            } else {
                Msg *slot = &w->out[(size_t)dest * MSG_BATCH +
                                    w->out_len[dest]];
                memcpy(slot->key, ckey, sizeof(ckey));
                slot->g = cg;
                slot->h = ch;
                slot->parenti = m;
                if (++w->out_len[dest] == MSG_BATCH &&
                    mt_flush_dest(w, dest)) { w->oom = 1; goto out; }
            }
        }
        /* hand successors over NOW, per expansion — the reference pushes
           same-rank nodes into the destination inbox immediately
           (ref: pastar/PAStar.cpp:377-385); deferring them a full batch
           makes f-plateau paths that alternate owners crawl while both
           workers burn through same-f junk. */
        if (mt_flush_all(w)) { w->oom = 1; goto out; }
    }
out:
    if (w->oom) { /* unblock everyone */
        /* publish "no work here" first so f-gated peers can't keep
           waiting on our stale (lower) min after we vanish */
        atomic_store_explicit(&w->cur_min_f, INT32_MAX,
                              memory_order_release);
        pthread_mutex_lock(&sh->term_mu);
        sh->done = 1;
        pthread_cond_broadcast(&sh->term_cv);
        pthread_mutex_unlock(&sh->term_mu);
    }
    free(scratch);
    return NULL;
}

/*
 * Multithreaded search entry.  Same contract as astar_search plus
 * n_threads/hash_shift; out_stats = {expanded, reopened, open, closed}.
 * out_tstats (nullable) receives the same 4 counters PER THREAD
 * (4*n_threads values), mirroring the reference's per-tid node table
 * (ref: pastar/PAStar.cpp:591-619).
 */
int64_t astar_search_mt(
    int n, int n_pairs, int W,
    const uint16_t *final_coord,
    const uint8_t *seqs, int enc_stride,
    const int32_t *cost_table,
    const int32_t *pair_x, const int32_t *pair_y, const int32_t *pair_w,
    const int32_t *tables, int S,
    int gap_open, int gap_ext, int gap_gap,
    int root_parenti,
    uint32_t init_cap,
    int n_threads, int hash_shift,
    int32_t *out_g, int32_t *out_h,
    int32_t *out_masks, int32_t *out_masks_len,
    int64_t *out_stats, int64_t *out_tstats)
{
    if (n_threads < 1) n_threads = 1;
    MtShared sh;
    memset(&sh, 0, sizeof(sh));
    sh.n = n; sh.n_pairs = n_pairs; sh.W = W; sh.T = n_threads;
    sh.M = (1 << n) - 1;
    sh.final_coord = final_coord;
    sh.seqs = seqs; sh.enc_stride = enc_stride;
    sh.cost_table = cost_table;
    sh.pair_x = pair_x; sh.pair_y = pair_y; sh.pair_w = pair_w;
    sh.tables = tables; sh.S = S;
    sh.gap_open = gap_open; sh.gap_ext = gap_ext; sh.gap_gap = gap_gap;
    sh.generic_gaps = (gap_open != gap_ext);
    sh.hash_shift = hash_shift;
    atomic_init(&sh.best_goal_g, INT32_MAX);
    atomic_init(&sh.sent, 0);
    atomic_init(&sh.recvd, 0);
    pthread_mutex_init(&sh.term_mu, NULL);
    pthread_cond_init(&sh.term_cv, NULL);
    pack_key(final_coord, n, W, sh.goal_key);

    sh.both_cnt = malloc(sizeof(int) * (size_t)(sh.M + 1));
    sh.both_pairs = malloc(sizeof(int32_t) * (size_t)(sh.M + 1) * n_pairs);
    sh.const_part = malloc(sizeof(int32_t) * (size_t)(sh.M + 1));
    sh.workers = calloc((size_t)n_threads, sizeof(MtWorker));
    if (!sh.both_cnt || !sh.both_pairs || !sh.const_part || !sh.workers)
        goto oom0;
    for (int m = 1; m <= sh.M; m++) {
        int cnt = 0;
        int32_t cst = 0;
        for (int p = 0; p < n_pairs; p++) {
            int bx = (m >> pair_x[p]) & 1;
            int by = (m >> pair_y[p]) & 1;
            if (bx && by) sh.both_pairs[(size_t)m * n_pairs + cnt++] = p;
            else if (!bx && !by) cst += gap_gap * pair_w[p];
            else cst += gap_ext * pair_w[p];
        }
        sh.both_cnt[m] = cnt;
        sh.const_part[m] = cst;
    }

    uint32_t per_cap = init_cap / (uint32_t)n_threads;
    uint32_t c = 1 << 12;
    while (c < per_cap) c <<= 1;
    for (int t = 0; t < n_threads; t++) {
        MtWorker *w = &sh.workers[t];
        w->tid = t;
        w->sh = &sh;
        atomic_init(&w->cur_min_f, INT32_MAX); /* calloc zero would gate
                                                  every other worker */
        if (map_init(&w->map, c)) goto oom;
        w->heap.cap = 1 << 14;
        w->heap.len = 0;
        w->heap.items = malloc((size_t)w->heap.cap * sizeof(MtHeapItem));
        w->inbox.cap = 1 << 12;
        w->inbox.len = 0;
        w->inbox.items = malloc((size_t)w->inbox.cap * sizeof(Msg));
        pthread_mutex_init(&w->inbox.mu, NULL);
        w->out = malloc(sizeof(Msg) * (size_t)n_threads * MSG_BATCH);
        w->out_len = calloc((size_t)n_threads, sizeof(uint32_t));
        if (!w->heap.items || !w->inbox.items || !w->out || !w->out_len)
            goto oom;
    }

    /* seed the root at its owner (rank 0 enqueues node_zero,
       ref: pastar/PAStar.cpp:141-150 — here the owner shard directly) */
    {
        uint16_t root[MAX_N];
        for (int i = 0; i < n; i++) root[i] = 0;
        uint32_t rkey[MAX_W];
        pack_key(root, n, W, rkey);
        int64_t rh = 0;
        for (int p = 0; p < n_pairs; p++)
            rh += (int64_t)pair_w[p] *
                  tables[(size_t)p * S * S];
        int owner = mt_owner(root, n, hash_shift, n_threads);
        MtWorker *w = &sh.workers[owner];
        int created;
        Entry *re = map_upsert(&w->map, rkey, W, &created);
        if (!re) goto oom;
        re->g = 0;
        re->h = (int32_t)rh;
        re->f = re->h;
        re->parenti = root_parenti;
        re->state = STATE_OPEN;
        if (mt_heap_push(&w->heap, re->f, 0, (uint32_t)(re - w->map.arena)))
            goto oom;
    }

    pthread_t *tids = malloc(sizeof(pthread_t) * (size_t)n_threads);
    if (!tids) goto oom;
    for (int t = 0; t < n_threads; t++)
        pthread_create(&tids[t], NULL, mt_worker_main, &sh.workers[t]);
    for (int t = 0; t < n_threads; t++)
        pthread_join(tids[t], NULL);
    free(tids);

    int any_oom = 0;
    for (int t = 0; t < n_threads; t++) any_oom |= sh.workers[t].oom;
    int32_t best = atomic_load(&sh.best_goal_g);
    if (any_oom || best == INT32_MAX) goto oom;

    /* backtrace across shards (all in shared memory) */
    {
        MtWorker *gw = &sh.workers[mt_owner(final_coord, n, hash_shift,
                                            n_threads)];
        Entry *ge = map_find(&gw->map, sh.goal_key, W);
        if (!ge) goto oom;
        *out_g = ge->g;
        *out_h = 0;
        int32_t len = 0;
        uint16_t cc[MAX_N];
        for (int i = 0; i < n; i++) cc[i] = final_coord[i];
        uint32_t ck[MAX_W];
        memcpy(ck, sh.goal_key, sizeof(ck));
        for (;;) {
            int at_origin = 1;
            for (int i = 0; i < n; i++) if (cc[i]) { at_origin = 0; break; }
            if (at_origin) break;
            MtWorker *ow = &sh.workers[mt_owner(cc, n, hash_shift, n_threads)];
            Entry *pe = map_find(&ow->map, ck, W);
            if (!pe) goto oom;
            int32_t pm = pe->parenti;
            out_masks[len++] = pm;
            for (int i = 0; i < n; i++) cc[i] -= (uint16_t)((pm >> i) & 1);
            pack_key(cc, n, W, ck);
        }
        *out_masks_len = len;
    }
    {
        int64_t exp = 0, reo = 0, open = 0, closed = 0;
        for (int t = 0; t < n_threads; t++) {
            exp += sh.workers[t].expanded;
            reo += sh.workers[t].reopened;
            open += sh.workers[t].heap.len;
            closed += sh.workers[t].map.used;
            if (out_tstats) {
                out_tstats[4 * t + 0] = sh.workers[t].expanded;
                out_tstats[4 * t + 1] = sh.workers[t].reopened;
                out_tstats[4 * t + 2] = sh.workers[t].heap.len;
                out_tstats[4 * t + 3] = sh.workers[t].map.used;
            }
        }
        out_stats[0] = exp;
        out_stats[1] = reo;
        out_stats[2] = open;
        out_stats[3] = closed;
    }
    for (int t = 0; t < n_threads; t++) {
        MtWorker *w = &sh.workers[t];
        map_free(&w->map);
        free(w->heap.items);
        free(w->inbox.items);
        free(w->out);
        free(w->out_len);
    }
    free(sh.workers);
    free(sh.both_cnt);
    free(sh.both_pairs);
    free(sh.const_part);
    return 0;

oom:
    for (int t = 0; t < n_threads; t++) {
        MtWorker *w = &sh.workers[t];
        if (w->map.arena) map_free(&w->map);
        free(w->heap.items);
        free(w->inbox.items);
        free(w->out);
        free(w->out_len);
    }
oom0:
    free(sh.workers);
    free(sh.both_cnt);
    free(sh.both_pairs);
    free(sh.const_part);
    return -1;
}
