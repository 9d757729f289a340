/* Session list + new-interview flow (scenario picker, interview mode).
   Re-implements reference web/app_modules/session_list_state.js (paging +
   ETag) and the new-session form in web/index.html. */
(function () {
  "use strict";

  let page = 1;
  const PAGE_SIZE = 20;

  async function mount(el) {
    el.innerHTML = `
      <div class="row between">
        <h2 style="margin:0">我的访谈</h2>
        <button id="new-session-btn">＋ 新建访谈</button>
      </div>
      <div class="card" style="margin-top:14px">
        <div id="session-table"><div class="thinking">
          <div class="spinner"></div>加载中…</div></div>
        <div class="pager" id="session-pager"></div>
      </div>`;
    el.querySelector("#new-session-btn").onclick = () => {
      if (DV.requireLogin()) showNewSession();
    };
    if (!DV.state.user) {
      el.querySelector("#session-table").innerHTML =
        '<div class="empty">请先登录后查看访谈列表</div>';
      return;
    }
    await load(el);
  }

  async function load(el) {
    const box = el.querySelector("#session-table");
    try {
      const { items, total } = await DVApi.list(
        `/api/sessions?page=${page}&page_size=${PAGE_SIZE}`);
      if (!items.length) {
        box.innerHTML = '<div class="empty">暂无访谈，点击右上角新建</div>';
        renderPager(el, total);
        return;
      }
      let html = `<table class="list"><thead><tr>
        <th>主题</th><th>状态</th><th>模式</th><th>轮次</th>
        <th>更新时间</th><th></th></tr></thead><tbody>`;
      items.forEach((s) => {
        const status = s.status === "completed"
          ? '<span class="badge ok">已完成</span>'
          : '<span class="badge info">进行中</span>';
        html += `<tr>
          <td class="clickable" data-open="${DVMarkdown.esc(s.session_id)}">
            ${DVMarkdown.esc(s.topic || "(无主题)")}</td>
          <td>${status}</td>
          <td>${DVMarkdown.esc(modeLabel(s.interview_mode))}</td>
          <td>${s.interview_count || 0}</td>
          <td class="muted">${fmtTime(s.updated_at)}</td>
          <td>
            ${s.current_report_name
              ? `<button class="small ghost" data-report="${DVMarkdown.esc(s.current_report_name)}">报告</button>`
              : ""}
            <button class="small ghost" data-del="${DVMarkdown.esc(s.session_id)}"
              style="color:var(--err)">删除</button>
          </td></tr>`;
      });
      html += "</tbody></table>";
      box.innerHTML = html;
      box.querySelectorAll("[data-open]").forEach((n) => {
        n.onclick = () => DV.show("interview", n.dataset.open);
      });
      box.querySelectorAll("[data-report]").forEach((n) => {
        n.onclick = () => DV.show("report", n.dataset.report);
      });
      box.querySelectorAll("[data-del]").forEach((n) => {
        n.onclick = async () => {
          if (!confirm("确认删除该访谈？")) return;
          await DVApi.del(`/api/sessions/${n.dataset.del}`);
          DV.toast("已删除", "ok");
          load(el);
        };
      });
      renderPager(el, total);
    } catch (e) {
      box.innerHTML = `<div class="error-text">${DVMarkdown.esc(e.message)}</div>`;
    }
  }

  function renderPager(el, total) {
    const pages = Math.max(1, Math.ceil(total / PAGE_SIZE));
    const pager = el.querySelector("#session-pager");
    pager.innerHTML = `
      <button class="small secondary" id="pg-prev" ${page <= 1 ? "disabled" : ""}>上一页</button>
      <span class="muted">第 ${page} / ${pages} 页 · 共 ${total} 条</span>
      <button class="small secondary" id="pg-next" ${page >= pages ? "disabled" : ""}>下一页</button>`;
    pager.querySelector("#pg-prev").onclick = () => { page--; load(el); };
    pager.querySelector("#pg-next").onclick = () => { page++; load(el); };
  }

  function modeLabel(m) {
    return { quick: "快速", standard: "标准", deep: "深度" }[m] || m || "标准";
  }
  function fmtTime(t) {
    if (!t) return "";
    return String(t).replace("T", " ").replace(/Z|\.\d+.*/, "");
  }

  // ---- new session -------------------------------------------------
  async function showNewSession() {
    let scenarios = [];
    try {
      scenarios = (await DVApi.get("/api/scenarios")).body || [];
    } catch (e) { /* scenario list optional */ }
    const caps = (DV.state.user && DV.state.user.capabilities) || {};
    const modes = caps.interview_modes || ["quick"];

    const m = DV.modal(`
      <h2>新建访谈</h2>
      <label class="field">访谈主题（必填）
        <input id="ns-topic" placeholder="例如：电商平台会员体系升级"></label>
      <label class="field">补充说明
        <textarea id="ns-desc" rows="2" placeholder="项目背景、目标（可选）"></textarea></label>
      <h3>访谈场景</h3>
      <div class="scenario-grid" id="ns-scenarios"></div>
      <div class="row" style="margin:10px 0">
        <button class="small ghost" id="ns-gen">✨ AI 根据描述生成场景</button>
      </div>
      <h3>访谈模式</h3>
      <div class="row" id="ns-modes"></div>
      <div class="error-text" id="ns-err"></div>
      <div class="row" style="margin-top:14px">
        <button id="ns-create" class="grow">开始访谈</button>
      </div>`);

    let selScenario = "product-requirement";
    let selMode = modes[0];

    const grid = m.querySelector("#ns-scenarios");
    (scenarios.length ? scenarios : [{ id: "product-requirement",
      name: "产品需求调研", description: "" }]).forEach((s) => {
      const c = document.createElement("div");
      c.className = "scenario-card" + (s.id === selScenario ? " selected" : "");
      c.innerHTML = `<div class="name">${DVMarkdown.esc(s.name || s.id)}</div>
        <div class="desc">${DVMarkdown.esc((s.description || "").slice(0, 60))}</div>`;
      c.onclick = () => {
        selScenario = s.id;
        grid.querySelectorAll(".scenario-card").forEach((x) =>
          x.classList.remove("selected"));
        c.classList.add("selected");
      };
      grid.appendChild(c);
    });

    const modeBox = m.querySelector("#ns-modes");
    ["quick", "standard", "deep"].forEach((mode) => {
      const allowed = modes.includes(mode);
      const b = document.createElement("button");
      b.className = "small " + (mode === selMode ? "" : "secondary");
      b.textContent = modeLabel(mode) + (allowed ? "" : " 🔒");
      b.disabled = !allowed;
      b.onclick = () => {
        selMode = mode;
        modeBox.querySelectorAll("button").forEach((x) =>
          x.classList.add("secondary"));
        b.classList.remove("secondary");
      };
      modeBox.appendChild(b);
    });

    m.querySelector("#ns-gen").onclick = async () => {
      const desc = m.querySelector("#ns-desc").value.trim() ||
                   m.querySelector("#ns-topic").value.trim();
      if (!desc) { DV.toast("请先填写主题或描述", "warn"); return; }
      m.querySelector("#ns-gen").disabled = true;
      try {
        const { body } = await DVApi.post("/api/scenarios/generate",
          { description: desc });
        if (body && body.id) {
          selScenario = body.id;
          DV.toast(`已生成场景：${body.name || body.id}`, "ok");
        }
      } catch (e) {
        DV.toast(e.message, "err");
      } finally {
        m.querySelector("#ns-gen").disabled = false;
      }
    };

    m.querySelector("#ns-create").onclick = async () => {
      const topic = m.querySelector("#ns-topic").value.trim();
      const err = m.querySelector("#ns-err");
      if (!topic) { err.textContent = "请填写访谈主题"; return; }
      try {
        const { body } = await DVApi.post("/api/sessions", {
          topic,
          description: m.querySelector("#ns-desc").value.trim(),
          scenario_id: selScenario,
          interview_mode: selMode,
        });
        DV.closeModal();
        DV.show("interview", body.session_id);
      } catch (e) {
        err.textContent = e.message;
      }
    };
  }

  DV.registerView("sessions", { mount });
})();
