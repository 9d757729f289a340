/* App shell: tab routing, toasts, modals, shared state.
   Re-implementation of the reference main shell (web/app.js:1 — Alpine.js
   state + tab routing between 列表/访谈/报告/管理). Vanilla JS here. */
(function () {
  "use strict";

  const state = {
    user: null,           // /api/auth/me payload.user
    view: "sessions",     // sessions | interview | reports | report | admin
    viewArg: null,
    siteConfig: window.SITE_CONFIG || {},
  };

  // ---- toasts -------------------------------------------------------
  function toast(msg, kind = "") {
    const box = document.getElementById("toasts");
    const el = document.createElement("div");
    el.className = `toast ${kind}`;
    el.textContent = msg;
    box.appendChild(el);
    setTimeout(() => el.remove(), 4200);
  }

  // ---- modal --------------------------------------------------------
  function modal(html) {
    closeModal();
    const back = document.createElement("div");
    back.className = "modal-backdrop";
    back.id = "dv-modal";
    back.innerHTML = `<div class="modal">${html}</div>`;
    back.addEventListener("click", (e) => {
      if (e.target === back) closeModal();
    });
    document.body.appendChild(back);
    return back.querySelector(".modal");
  }
  function closeModal() {
    const m = document.getElementById("dv-modal");
    if (m) m.remove();
  }

  // ---- view routing -------------------------------------------------
  const views = {};   // name -> {mount(el, arg), unmount?()}
  let active = null;

  function registerView(name, impl) { views[name] = impl; }

  function show(name, arg) {
    if (active && views[active] && views[active].unmount) {
      try { views[active].unmount(); } catch (e) { /* view teardown */ }
    }
    state.view = name;
    state.viewArg = arg;
    active = name;
    // deep-linkable hash (#view or #view/arg); object args use their
    // natural string key so reloads land back on the same resource
    const key = typeof arg === "string" ? arg
      : (arg && (arg.report_name || arg.session_id)) || "";
    const hash = "#" + name + (key ? "/" + encodeURIComponent(key) : "");
    if (location.hash !== hash) {
      suppressHash = true;
      location.hash = hash;
    }
    document.querySelectorAll("nav.tabs button").forEach((b) => {
      b.classList.toggle("active", b.dataset.view === name);
    });
    const el = document.getElementById("view");
    el.innerHTML = "";
    const impl = views[name];
    if (impl) impl.mount(el, arg);
  }

  // ---- auth-aware boot ---------------------------------------------
  async function refreshUser() {
    try {
      const { body } = await DVApi.get("/api/auth/me");
      state.user = body.authenticated ? body.user : null;
    } catch (e) {
      state.user = null;
    }
    renderUserBox();
    return state.user;
  }

  function renderUserBox() {
    const box = document.getElementById("user-box");
    const adminBtn = document.querySelector('[data-view="admin"]');
    if (!state.user) {
      box.innerHTML = '<button class="small" id="login-btn">登录</button>';
      box.querySelector("#login-btn").onclick = () => DVAuth.showLogin();
      if (adminBtn) adminBtn.style.display = "none";
      return;
    }
    const u = state.user;
    box.innerHTML = `
      <span class="level-tag">${DVMarkdown.esc(levelLabel(u.level))}</span>
      <span>${DVMarkdown.esc(u.nickname || u.phone || "用户")}</span>
      <button class="small ghost" id="account-btn">账号</button>
      <button class="small secondary" id="logout-btn">退出</button>`;
    box.querySelector("#logout-btn").onclick = async () => {
      await DVApi.post("/api/auth/logout", {});
      state.user = null;
      renderUserBox();
      show("sessions");
    };
    box.querySelector("#account-btn").onclick = () => DVAuth.showAccount();
    if (adminBtn) adminBtn.style.display = u.is_admin ? "" : "none";
  }

  function levelLabel(level) {
    return { experience: "体验版", standard: "标准版",
             professional: "专业版" }[level] || level || "体验版";
  }

  function requireLogin() {
    if (state.user) return true;
    DVAuth.showLogin();
    return false;
  }

  // ---- boot ---------------------------------------------------------
  let suppressHash = false;

  function parseHash() {
    const h = (location.hash || "").replace(/^#/, "");
    if (!h) return null;
    const i = h.indexOf("/");
    const name = i === -1 ? h : h.slice(0, i);
    const arg = i === -1 ? undefined : decodeURIComponent(h.slice(i + 1));
    return views[name] ? { name, arg } : null;
  }

  // ---- theme (tokens swap via html[data-theme]; persisted) ----------
  function applyTheme(theme) {
    if (theme === "dark") {
      document.documentElement.setAttribute("data-theme", "dark");
    } else {
      document.documentElement.removeAttribute("data-theme");
    }
  }
  function toggleTheme() {
    const next = document.documentElement.getAttribute("data-theme") ===
      "dark" ? "" : "dark";
    applyTheme(next);
    try { localStorage.setItem("dv-theme", next); } catch (e) { /* ok */ }
  }

  async function boot() {
    document.querySelectorAll("nav.tabs button").forEach((b) => {
      b.onclick = () => show(b.dataset.view);
    });
    try { applyTheme(localStorage.getItem("dv-theme")); } catch (e) { /* */ }
    const themeBtn = document.getElementById("theme-toggle");
    if (themeBtn) themeBtn.onclick = toggleTheme;
    await refreshUser();
    window.addEventListener("hashchange", () => {
      if (suppressHash) { suppressHash = false; return; }
      const t = parseHash();
      if (t && t.name !== state.view) show(t.name, t.arg);
      else if (t && t.arg !== undefined && t.arg !== state.viewArg &&
               typeof state.viewArg !== "object") show(t.name, t.arg);
    });
    const target = parseHash();
    show(target ? target.name : "sessions", target ? target.arg : undefined);
  }

  window.DV = {
    state, toast, modal, closeModal, registerView, show, refreshUser,
    requireLogin, levelLabel,
  };
  document.addEventListener("DOMContentLoaded", boot);
})();
