/* Reports: list, detail (markdown render), exports (md/docx/pdf/appendix),
   presentation chain (Refly status polling), solution page entry, delete.
   Re-implements reference web/app_modules/report_state.js +
   report_detail_runtime.js. */
(function () {
  "use strict";

  let page = 1;
  const PAGE_SIZE = 20;

  // ---- list view ----------------------------------------------------
  async function mountList(el) {
    el.innerHTML = `
      <div class="row between">
        <h2 style="margin:0">我的报告</h2>
      </div>
      <div class="card" style="margin-top:14px">
        <div id="report-table"><div class="thinking">
          <div class="spinner"></div>加载中…</div></div>
        <div class="pager" id="report-pager"></div>
      </div>`;
    if (!DV.state.user) {
      el.querySelector("#report-table").innerHTML =
        '<div class="empty">请先登录</div>';
      return;
    }
    await loadList(el);
  }

  async function loadList(el) {
    const box = el.querySelector("#report-table");
    try {
      const { items, total } = await DVApi.list(
        `/api/reports?page=${page}&page_size=${PAGE_SIZE}`);
      if (!items.length) {
        box.innerHTML = '<div class="empty">暂无报告 — 完成一次访谈后生成</div>';
        return;
      }
      let html = `<table class="list"><thead><tr>
        <th>报告</th><th>主题</th><th>画像</th><th>创建时间</th><th></th>
        </tr></thead><tbody>`;
      items.forEach((r) => {
        html += `<tr>
          <td class="clickable" data-open="${DVMarkdown.esc(r.report_name)}">
            ${DVMarkdown.esc(shortName(r.report_name))}</td>
          <td>${DVMarkdown.esc(r.topic || "")}</td>
          <td><span class="badge">${DVMarkdown.esc(r.report_profile || "balanced")}</span></td>
          <td class="muted">${fmtTime(r.created_at)}</td>
          <td>
            <button class="small ghost" data-solution="${DVMarkdown.esc(r.report_name)}">方案页</button>
            <button class="small ghost" style="color:var(--err)"
              data-del="${DVMarkdown.esc(r.report_name)}">删除</button>
          </td></tr>`;
      });
      html += "</tbody></table>";
      box.innerHTML = html;
      box.querySelectorAll("[data-open]").forEach((n) => {
        n.onclick = () => DV.show("report", n.dataset.open);
      });
      box.querySelectorAll("[data-solution]").forEach((n) => {
        n.onclick = () => window.open(
          `/solution.html?report=${encodeURIComponent(n.dataset.solution)}`,
          "_blank");
      });
      box.querySelectorAll("[data-del]").forEach((n) => {
        n.onclick = async () => {
          if (!confirm("确认删除该报告？")) return;
          await DVApi.del(`/api/reports/${encodeURIComponent(n.dataset.del)}`);
          DV.toast("已删除", "ok");
          loadList(el);
        };
      });
      const pages = Math.max(1, Math.ceil(total / PAGE_SIZE));
      const pager = el.querySelector("#report-pager");
      pager.innerHTML = `
        <button class="small secondary" id="rp-prev" ${page <= 1 ? "disabled" : ""}>上一页</button>
        <span class="muted">第 ${page} / ${pages} 页 · 共 ${total} 条</span>
        <button class="small secondary" id="rp-next" ${page >= pages ? "disabled" : ""}>下一页</button>`;
      pager.querySelector("#rp-prev").onclick = () => { page--; loadList(el); };
      pager.querySelector("#rp-next").onclick = () => { page++; loadList(el); };
    } catch (e) {
      box.innerHTML = `<div class="error-text">${DVMarkdown.esc(e.message)}</div>`;
    }
  }

  function shortName(name) {
    return (name || "").replace(/\.md$/, "").slice(0, 48);
  }
  function fmtTime(t) {
    return (t || "").replace("T", " ").replace(/Z|\.\d+.*/, "");
  }

  // ---- detail view ----------------------------------------------------
  let presTimer = null;

  async function mountDetail(el, reportName) {
    el.innerHTML = `
      <div class="row between">
        <button class="small secondary" id="rd-back">← 报告列表</button>
        <div class="row" id="rd-actions">
          <button class="small secondary" data-fmt="markdown">导出 MD</button>
          <button class="small secondary" data-fmt="docx">导出 Word</button>
          <button class="small secondary" data-fmt="pdf">导出 PDF</button>
          <button class="small secondary" id="rd-appendix">附录 PDF</button>
          <button class="small secondary" id="rd-pres">演示稿</button>
          <button class="small" id="rd-solution">方案页</button>
          <button class="small secondary" id="rd-share">分享方案</button>
        </div>
      </div>
      <div class="card" style="margin-top:14px">
        <div id="rd-body"><div class="thinking">
          <div class="spinner"></div>加载报告…</div></div>
      </div>`;
    el.querySelector("#rd-back").onclick = () => DV.show("reports");
    el.querySelector("#rd-solution").onclick = () => window.open(
      `/solution.html?report=${encodeURIComponent(reportName)}`, "_blank");
    el.querySelector("#rd-share").onclick = () => shareSolution(reportName);
    el.querySelector("#rd-appendix").onclick = () => window.open(
      `/api/reports/${encodeURIComponent(reportName)}/appendix/pdf`, "_blank");
    el.querySelector("#rd-pres").onclick = () => presentation(reportName);
    el.querySelectorAll("[data-fmt]").forEach((b) => {
      b.onclick = () => doExport(reportName, b.dataset.fmt, b);
    });

    try {
      const { body } = await DVApi.get(
        `/api/reports/${encodeURIComponent(reportName)}`);
      el.querySelector("#rd-body").innerHTML = DVMarkdown.render(
        typeof body === "string" ? body : (body.content || ""));
    } catch (e) {
      el.querySelector("#rd-body").innerHTML =
        `<div class="error-text">${DVMarkdown.esc(e.message)}</div>`;
    }
  }

  function unmountDetail() {
    clearInterval(presTimer);
  }

  async function doExport(reportName, fmt, btn) {
    btn.disabled = true;
    try {
      const { body } = await DVApi.post(
        `/api/reports/${encodeURIComponent(reportName)}/exports`,
        { format: fmt });
      // download the archived asset
      window.open(
        `/api/reports/${encodeURIComponent(reportName)}/exports/${body.asset_id}`,
        "_blank");
    } catch (e) {
      DV.toast(e.message, "err");
    } finally {
      btn.disabled = false;
    }
  }

  async function shareSolution(reportName) {
    try {
      const { body } = await DVApi.post(
        `/api/reports/${encodeURIComponent(reportName)}/solution/share`, {});
      const url = `${location.origin}/solution.html?share=${body.share_token}`;
      const m = DV.modal(`
        <h2>方案分享链接</h2>
        <input readonly value="${DVMarkdown.esc(url)}" id="share-url">
        <div class="row" style="margin-top:10px">
          <button id="share-copy">复制链接</button>
        </div>`);
      m.querySelector("#share-copy").onclick = () => {
        const inp = m.querySelector("#share-url");
        inp.select();
        document.execCommand("copy");
        DV.toast("已复制", "ok");
      };
    } catch (e) {
      DV.toast(e.message, "err");
    }
  }

  // ---- presentation (Refly chain; reference report_detail_runtime.js) --
  async function presentation(reportName) {
    const enc = encodeURIComponent(reportName);
    const m = DV.modal(`
      <h2>AI 演示稿</h2>
      <p class="muted" id="pres-msg">查询状态…</p>
      <div class="row">
        <button id="pres-start">生成演示稿</button>
        <button class="secondary" id="pres-get" disabled>下载 PDF</button>
        <button class="secondary" id="pres-abort" disabled>中止</button>
      </div>`);
    const msg = m.querySelector("#pres-msg");
    const btnGet = m.querySelector("#pres-get");
    const btnAbort = m.querySelector("#pres-abort");

    async function poll() {
      try {
        const { body: st } = await DVApi.get(
          `/api/reports/${enc}/presentation/status`);
        msg.textContent = `状态：${st.state || "none"} ${st.detail || ""}`;
        btnGet.disabled = st.state !== "completed";
        btnAbort.disabled = !(st.state === "running" || st.state === "queued");
        if (st.state === "completed" || st.state === "failed") {
          clearInterval(presTimer);
        }
      } catch (e) {
        msg.textContent = e.message;
      }
    }
    m.querySelector("#pres-start").onclick = async () => {
      try {
        await DVApi.post(`/api/reports/${enc}/refly`, {});
        DV.toast("已提交演示稿任务", "ok");
        clearInterval(presTimer);
        presTimer = setInterval(poll, 3000);
      } catch (e) { msg.textContent = e.message; }
    };
    btnGet.onclick = () => window.open(
      `/api/reports/${enc}/presentation`, "_blank");
    btnAbort.onclick = async () => {
      await DVApi.post(`/api/reports/${enc}/presentation/abort`, {});
      poll();
    };
    poll();
  }

  DV.registerView("reports", { mount: mountList });
  DV.registerView("report", { mount: mountDetail, unmount: unmountDetail });
})();
