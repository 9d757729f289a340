/* API layer: JSON fetch with the reference's client semantics —
   429 Retry-After honoring (reference app_modules/interview_runtime.js:209),
   ETag-aware list fetches, and abortable requests for the watchdog. */
(function () {
  "use strict";

  const etags = new Map();   // url -> {etag, body, total}

  async function request(path, opts = {}) {
    const init = {
      method: opts.method || "GET",
      headers: { Accept: "application/json" },
      credentials: "same-origin",
      signal: opts.signal,
    };
    if (opts.json !== undefined) {
      init.headers["Content-Type"] = "application/json";
      init.body = JSON.stringify(opts.json);
    }
    if (opts.formData) init.body = opts.formData;

    const resp = await fetch(path, init);

    // 429: retry once after Retry-After seconds (capped), unless disabled
    if (resp.status === 429 && !opts.noRetry) {
      const wait = Math.min(
        parseFloat(resp.headers.get("Retry-After") || "2") || 2, 10);
      DV.toast(`服务繁忙，${wait}s 后自动重试…`, "warn");
      await new Promise((r) => setTimeout(r, wait * 1000));
      return request(path, { ...opts, noRetry: true });
    }

    const ctype = resp.headers.get("Content-Type") || "";
    let body = null;
    if (ctype.includes("json")) {
      try { body = await resp.json(); } catch (e) { body = null; }
    } else {
      body = await resp.text();
    }
    if (!resp.ok) {
      const msg = (body && body.error) || `HTTP ${resp.status}`;
      const err = new Error(msg);
      err.status = resp.status;
      err.body = body;
      throw err;
    }
    return { body, resp };
  }

  // ETag-aware list fetch: sends If-None-Match, serves cached on 304.
  async function fetchList(path, opts = {}) {
    const cached = etags.get(path);
    const headers = { Accept: "application/json" };
    if (cached) headers["If-None-Match"] = cached.etag;
    const resp = await fetch(path, { headers, credentials: "same-origin" });
    if (resp.status === 304 && cached) {
      return { items: cached.body, total: cached.total, cached: true };
    }
    if (resp.status === 429 && !opts.noRetry) {
      const wait = Math.min(
        parseFloat(resp.headers.get("Retry-After") || "2") || 2, 10);
      await new Promise((r) => setTimeout(r, wait * 1000));
      return fetchList(path, { noRetry: true });
    }
    if (!resp.ok) {
      const body = await resp.json().catch(() => ({}));
      const err = new Error(body.error || `HTTP ${resp.status}`);
      err.status = resp.status;
      throw err;
    }
    const items = await resp.json();
    const etag = resp.headers.get("ETag");
    const total = parseInt(resp.headers.get("X-Total-Count") || "0", 10);
    if (etag) etags.set(path, { etag, body: items, total });
    return { items, total, cached: false };
  }

  window.DVApi = {
    get: (p, o) => request(p, o),
    post: (p, json, o) => request(p, { ...(o || {}), method: "POST", json }),
    put: (p, json) => request(p, { method: "PUT", json }),
    del: (p) => request(p, { method: "DELETE" }),
    upload: (p, formData) => request(p, { method: "POST", formData }),
    list: fetchList,
  };
})();
