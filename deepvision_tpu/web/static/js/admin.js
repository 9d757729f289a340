/* Admin center: licenses / users / usage / metrics / config center /
   ownership migrations / feature flags.
   Re-implements reference web/app_modules/admin_center_state.js. */
(function () {
  "use strict";

  let tab = "licenses";
  let root = null;

  const TABS = [
    ["licenses", "授权管理"],
    ["users", "用户"],
    ["usage", "用量"],
    ["metrics", "性能指标"],
    ["config", "配置中心"],
    ["ownership", "归属迁移"],
    ["flags", "功能开关"],
  ];

  function mount(el) {
    root = el;
    if (!DV.state.user || !DV.state.user.is_admin) {
      el.innerHTML = '<div class="card"><div class="empty">需要管理员权限</div></div>';
      return;
    }
    el.innerHTML = `
      <h2 style="margin:0 0 12px">管理中心</h2>
      <div class="admin-tabs" id="adm-tabs"></div>
      <div id="adm-body"></div>`;
    const tabsEl = el.querySelector("#adm-tabs");
    TABS.forEach(([id, label]) => {
      const b = document.createElement("button");
      b.textContent = label;
      b.className = id === tab ? "active" : "";
      b.onclick = () => { tab = id; mount(el); };
      tabsEl.appendChild(b);
    });
    const body = el.querySelector("#adm-body");
    ({ licenses, users, usage, metrics, config, ownership, flags }[tab])(body);
  }

  // ---- licenses -------------------------------------------------------
  async function licenses(el) {
    el.innerHTML = `
      <div class="card">
        <div class="stat-grid" id="lic-summary"></div>
      </div>
      <div class="card">
        <h3 style="margin-top:0">批量生成</h3>
        <div class="row">
          <input id="lic-count" type="number" value="5" style="width:90px">
          <select id="lic-level" style="width:140px">
            <option value="standard">标准版</option>
            <option value="professional">专业版</option>
            <option value="experience">体验版</option>
          </select>
          <input id="lic-days" type="number" value="365" style="width:110px">
          <button class="small" id="lic-gen">生成</button>
          <button class="small secondary" id="lic-bootstrap">初始化首个管理员授权</button>
        </div>
        <pre class="json" id="lic-codes" style="display:none"></pre>
      </div>
      <div class="card">
        <div class="row">
          <input id="lic-q-code" placeholder="按激活码搜索" style="width:200px">
          <select id="lic-q-status" style="width:130px">
            <option value="">全部状态</option>
            <option value="unused">未使用</option>
            <option value="active">已激活</option>
            <option value="revoked">已吊销</option>
          </select>
          <button class="small secondary" id="lic-search">搜索</button>
        </div>
        <div id="lic-table"></div>
      </div>`;

    try {
      const { body: s } = await DVApi.get("/api/admin/licenses/summary");
      el.querySelector("#lic-summary").innerHTML = Object.entries(s)
        .map(([k, v]) => `<div class="stat"><div class="v">${
          typeof v === "object" ? JSON.stringify(v) : v}</div>
          <div class="k">${DVMarkdown.esc(k)}</div></div>`).join("");
    } catch (e) { /* summary best-effort */ }

    el.querySelector("#lic-gen").onclick = async () => {
      try {
        const { body } = await DVApi.post("/api/admin/licenses/batch", {
          count: parseInt(el.querySelector("#lic-count").value, 10) || 1,
          level: el.querySelector("#lic-level").value,
          days_valid: parseInt(el.querySelector("#lic-days").value, 10) || 365,
        });
        const pre = el.querySelector("#lic-codes");
        pre.style.display = "";
        pre.textContent = (body.codes || []).join("\n");
        DV.toast(`已生成 ${body.count} 个激活码`, "ok");
      } catch (e) { DV.toast(e.message, "err"); }
    };
    el.querySelector("#lic-bootstrap").onclick = async () => {
      try {
        await DVApi.post("/api/admin/licenses/bootstrap", {});
        DV.toast("已初始化", "ok");
      } catch (e) { DV.toast(e.message, "err"); }
    };
    el.querySelector("#lic-search").onclick = loadLicenses;
    loadLicenses();

    async function loadLicenses() {
      const code = el.querySelector("#lic-q-code").value.trim();
      const status = el.querySelector("#lic-q-status").value;
      try {
        const { body } = await DVApi.get(
          `/api/admin/licenses?code=${encodeURIComponent(code)}&status=${status}`);
        const rows = body.items || body || [];
        el.querySelector("#lic-table").innerHTML = rows.length
          ? `<table class="list"><thead><tr><th>ID</th><th>激活码</th>
             <th>等级</th><th>状态</th><th>用户</th><th>到期</th><th></th></tr>
             </thead><tbody>` + rows.map((l) => `<tr>
               <td>${l.license_id}</td>
               <td><code>${DVMarkdown.esc(l.code || l.code_masked || "")}</code></td>
               <td>${DVMarkdown.esc(l.level || "")}</td>
               <td><span class="badge ${l.status === "active" ? "ok"
                 : l.status === "revoked" ? "err" : ""}">${
                 DVMarkdown.esc(l.status || "")}</span></td>
               <td>${l.user_id || ""}</td>
               <td class="muted">${DVMarkdown.esc(l.expires_at || "")}</td>
               <td>
                 <button class="small ghost" data-extend="${l.license_id}">续期</button>
                 <button class="small ghost" style="color:var(--err)"
                   data-revoke="${l.license_id}">吊销</button>
               </td></tr>`).join("") + "</tbody></table>"
          : '<div class="empty">无匹配授权</div>';
        el.querySelectorAll("[data-revoke]").forEach((b) => {
          b.onclick = async () => {
            await DVApi.post(`/api/admin/licenses/${b.dataset.revoke}/revoke`, {});
            loadLicenses();
          };
        });
        el.querySelectorAll("[data-extend]").forEach((b) => {
          b.onclick = async () => {
            const days = prompt("续期天数", "30");
            if (!days) return;
            await DVApi.post(`/api/admin/licenses/${b.dataset.extend}/extend`,
              { days: parseInt(days, 10) });
            loadLicenses();
          };
        });
      } catch (e) {
        el.querySelector("#lic-table").innerHTML =
          `<div class="error-text">${DVMarkdown.esc(e.message)}</div>`;
      }
    }
  }

  // ---- users ----------------------------------------------------------
  async function users(el) {
    el.innerHTML = `<div class="card">
      <div class="row">
        <input id="u-q" placeholder="手机号 / 昵称 / ID" style="width:240px">
        <button class="small secondary" id="u-search">搜索</button>
      </div>
      <div id="u-table"></div></div>`;
    el.querySelector("#u-search").onclick = load;
    load();
    async function load() {
      const q = el.querySelector("#u-q").value.trim();
      try {
        const { body } = await DVApi.get(
          `/api/admin/users?q=${encodeURIComponent(q)}`);
        const rows = body.items || body || [];
        el.querySelector("#u-table").innerHTML = rows.length
          ? `<table class="list"><thead><tr><th>ID</th><th>手机号</th>
             <th>昵称</th><th>等级</th><th>管理员</th><th>注册时间</th></tr>
             </thead><tbody>` + rows.map((u) => `<tr>
               <td>${u.user_id}</td>
               <td>${DVMarkdown.esc(u.phone || "")}</td>
               <td>${DVMarkdown.esc(u.nickname || "")}</td>
               <td>${DVMarkdown.esc(u.level || "")}</td>
               <td>${u.is_admin ? "✓" : ""}</td>
               <td class="muted">${DVMarkdown.esc(u.created_at || "")}</td>
             </tr>`).join("") + "</tbody></table>"
          : '<div class="empty">无用户</div>';
      } catch (e) {
        el.querySelector("#u-table").innerHTML =
          `<div class="error-text">${DVMarkdown.esc(e.message)}</div>`;
      }
    }
  }

  // ---- usage ----------------------------------------------------------
  async function usage(el) {
    el.innerHTML = '<div class="card" id="usage-box">加载中…</div>';
    try {
      const { body } = await DVApi.get("/api/admin/usage/summary");
      el.querySelector("#usage-box").innerHTML = `
        <h3 style="margin-top:0">系统用量</h3>
        <div class="stat-grid">${Object.entries(body)
          .filter(([, v]) => typeof v !== "object")
          .map(([k, v]) => `<div class="stat"><div class="v">${v}</div>
            <div class="k">${DVMarkdown.esc(k)}</div></div>`).join("")}</div>
        <pre class="json">${DVMarkdown.esc(JSON.stringify(body, null, 2))}</pre>`;
    } catch (e) {
      el.querySelector("#usage-box").innerHTML =
        `<div class="error-text">${DVMarkdown.esc(e.message)}</div>`;
    }
  }

  // ---- metrics ---------------------------------------------------------
  async function metrics(el) {
    el.innerHTML = `<div class="card">
      <div class="row between">
        <h3 style="margin:0">性能指标（/api/metrics）</h3>
        <div>
          <button class="small secondary" id="m-refresh">刷新</button>
          <button class="small danger" id="m-reset">重置</button>
        </div>
      </div>
      <div class="stat-grid" id="m-stats" style="margin-top:12px"></div>
      <pre class="json" id="m-json"></pre></div>`;
    el.querySelector("#m-refresh").onclick = load;
    el.querySelector("#m-reset").onclick = async () => {
      await DVApi.post("/api/metrics/reset", {});
      DV.toast("已重置", "ok");
      load();
    };
    load();
    async function load() {
      try {
        const { body } = await DVApi.get("/api/metrics");
        const ai = body.ai_calls || {};
        const qg = body.question_generation || {};
        el.querySelector("#m-stats").innerHTML = [
          ["AI 调用", ai.count || 0],
          ["问题生成", qg.count || 0],
          ["降级次数", qg.fallback_triggered || 0],
          ["AI p50 (ms)", (ai.total_ms || {}).p50 || 0],
          ["AI p95 (ms)", (ai.total_ms || {}).p95 || 0],
          ["检索判定", (body.search_decision || {}).total || 0],
        ].map(([k, v]) => `<div class="stat"><div class="v">${v}</div>
          <div class="k">${k}</div></div>`).join("");
        el.querySelector("#m-json").textContent =
          JSON.stringify(body, null, 2);
      } catch (e) { DV.toast(e.message, "err"); }
    }
  }

  // ---- config center ----------------------------------------------------
  async function config(el) {
    el.innerHTML = '<div class="card" id="cfg-box">加载中…</div>';
    try {
      const { body } = await DVApi.get("/api/admin/config-center");
      const box = el.querySelector("#cfg-box");
      let html = `<h3 style="margin-top:0">配置中心
        <span class="badge">${DVMarkdown.esc(body.resolution_mode || "")}</span></h3>`;
      Object.entries(body.groups || {}).forEach(([group, keys]) => {
        html += `<h3>${DVMarkdown.esc(group)}</h3>`;
        keys.forEach((k) => {
          const val = k.sensitive && k.current_value ? "••••••" :
            (k.current_value == null ? "" : String(k.current_value));
          html += `<label class="field">${DVMarkdown.esc(k.key)}
            ${k.runtime_override ? '<span class="badge info">运行时覆盖</span>' : ""}
            <input data-cfg="${DVMarkdown.esc(k.key)}"
              value="${DVMarkdown.esc(val)}" ${k.sensitive ? "disabled" : ""}>
          </label>`;
        });
      });
      html += '<div class="row"><button id="cfg-save">保存修改</button></div>';
      box.innerHTML = html;
      box.querySelector("#cfg-save").onclick = async () => {
        const updates = {};
        box.querySelectorAll("[data-cfg]").forEach((inp) => {
          if (!inp.disabled && inp.value !== inp.defaultValue) {
            updates[inp.dataset.cfg] = inp.value;
          }
        });
        if (!Object.keys(updates).length) {
          DV.toast("没有修改", "warn");
          return;
        }
        const { body: r } = await DVApi.post(
          "/api/admin/config-center/save", { updates });
        DV.toast(`已保存 ${Object.keys(r.applied || {}).length} 项`, "ok");
      };
    } catch (e) {
      el.querySelector("#cfg-box").innerHTML =
        `<div class="error-text">${DVMarkdown.esc(e.message)}</div>`;
    }
  }

  // ---- ownership migrations ---------------------------------------------
  async function ownership(el) {
    el.innerHTML = `<div class="card">
      <h3 style="margin-top:0">归属迁移（audit → preview → apply → rollback）</h3>
      <div class="row">
        <input id="own-from" placeholder="from_user_id" style="width:140px">
        <input id="own-to" placeholder="to_user_id" style="width:140px">
        <button class="small secondary" id="own-audit">审计</button>
        <button class="small secondary" id="own-preview">预览</button>
      </div>
      <div id="own-result"></div>
      <h3>历史操作</h3><div id="own-history"></div></div>`;

    const result = el.querySelector("#own-result");
    let previewToken = null;

    el.querySelector("#own-audit").onclick = async () => {
      try {
        const { body } = await DVApi.post("/api/admin/ownership-migrations/audit",
          { user_id: el.querySelector("#own-from").value.trim() });
        result.innerHTML = `<pre class="json">${DVMarkdown.esc(
          JSON.stringify(body, null, 2))}</pre>`;
      } catch (e) { DV.toast(e.message, "err"); }
    };
    el.querySelector("#own-preview").onclick = async () => {
      try {
        const { body } = await DVApi.post(
          "/api/admin/ownership-migrations/preview", {
            from_user_id: el.querySelector("#own-from").value.trim(),
            to_user_id: el.querySelector("#own-to").value.trim(),
          });
        previewToken = body.preview_token;
        const confirmWord = body.confirm_word;
        result.innerHTML = `<pre class="json">${DVMarkdown.esc(
          JSON.stringify(body, null, 2))}</pre>
          <div class="row">
            <input id="own-confirm" placeholder="输入确认词" style="width:200px">
            <button class="small danger" id="own-apply">执行迁移</button>
          </div>`;
        result.querySelector("#own-apply").onclick = async () => {
          try {
            const { body: r } = await DVApi.post(
              "/api/admin/ownership-migrations/apply", {
                preview_token: previewToken,
                confirm_word: result.querySelector("#own-confirm").value.trim(),
              });
            DV.toast("迁移完成", "ok");
            result.innerHTML += `<pre class="json">${DVMarkdown.esc(
              JSON.stringify(r, null, 2))}</pre>`;
            loadHistory();
          } catch (e) { DV.toast(e.message, "err"); }
        };
      } catch (e) { DV.toast(e.message, "err"); }
    };

    async function loadHistory() {
      try {
        const { body } = await DVApi.get("/api/admin/ownership-migrations");
        const rows = body.items || body || [];
        el.querySelector("#own-history").innerHTML = rows.length
          ? `<table class="list"><thead><tr><th>操作ID</th><th>from→to</th>
              <th>时间</th><th></th></tr></thead><tbody>` +
            rows.map((op) => `<tr>
              <td>${DVMarkdown.esc(op.action || "")}</td>
              <td>${DVMarkdown.esc(op.payload || "")}</td>
              <td class="muted">${DVMarkdown.esc(op.created_at || "")}</td>
              <td><button class="small ghost" data-rb="${
                DVMarkdown.esc((op.backup_path || "").split("/").pop())}">回滚</button></td>
            </tr>`).join("") + "</tbody></table>"
          : '<div class="muted">暂无记录</div>';
        el.querySelectorAll("[data-rb]").forEach((b) => {
          b.onclick = async () => {
            await DVApi.post("/api/admin/ownership-migrations/rollback",
              { operation_id: b.dataset.rb });
            DV.toast("已回滚", "ok");
            loadHistory();
          };
        });
      } catch (e) { /* history best-effort */ }
    }
    loadHistory();
  }

  // ---- feature flags -----------------------------------------------------
  async function flags(el) {
    el.innerHTML = '<div class="card" id="flag-box">加载中…</div>';
    const box = el.querySelector("#flag-box");
    try {
      const [lic, pres] = await Promise.all([
        DVApi.get("/api/admin/license-enforcement"),
        DVApi.get("/api/admin/presentation-feature"),
      ]);
      box.innerHTML = `
        <h3 style="margin-top:0">功能开关</h3>
        <div class="row between" style="margin:10px 0">
          <span>授权强制校验（license enforcement）</span>
          <div>
            <span class="badge ${lic.body.enabled ? "ok" : ""}">${
              lic.body.enabled ? "已开启" : "关闭"}</span>
            <button class="small secondary" id="f-lic-toggle">切换</button>
            <button class="small ghost" id="f-lic-default">跟随默认</button>
          </div>
        </div>
        <div class="row between" style="margin:10px 0">
          <span>AI 演示稿功能（presentation）</span>
          <div>
            <span class="badge ${pres.body.enabled ? "ok" : ""}">${
              pres.body.enabled ? "已开启" : "关闭"}</span>
            <button class="small secondary" id="f-pres-toggle">切换</button>
            <button class="small ghost" id="f-pres-default">跟随默认</button>
          </div>
        </div>`;
      box.querySelector("#f-lic-toggle").onclick = async () => {
        await DVApi.post("/api/admin/license-enforcement",
          { enabled: !lic.body.enabled });
        flags(el);
      };
      box.querySelector("#f-pres-toggle").onclick = async () => {
        await DVApi.post("/api/admin/presentation-feature",
          { enabled: !pres.body.enabled });
        flags(el);
      };
      box.querySelector("#f-lic-default").onclick = async () => {
        await DVApi.post("/api/admin/license-enforcement/follow-default", {});
        flags(el);
      };
      box.querySelector("#f-pres-default").onclick = async () => {
        await DVApi.post("/api/admin/presentation-feature/follow-default", {});
        flags(el);
      };
    } catch (e) {
      box.innerHTML = `<div class="error-text">${DVMarkdown.esc(e.message)}</div>`;
    }
  }

  DV.registerView("admin", { mount });
})();
