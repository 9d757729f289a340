#!/usr/bin/env python
"""Standalone ownership-migration CLI — operator use without the HTTP
plane (reference scripts/admin_migrate_ownership.py:1 +
admin_ownership_service.py; our service layer is
deepvision_tpu/web/ownership.py, shared with the admin routes).

Subcommands:
  list-users   enumerate accounts to pick a migration target
  audit        what a user currently owns (sessions/reports + samples)
  migrate      move ownership from one user to another; DRY-RUN by
               default, --apply to execute (writes a rollback backup)
  rollback     restore a previous migration from its backup file
  history      the audited migration log

Examples:
  python scripts/admin_migrate_ownership.py list-users --query 139
  python scripts/admin_migrate_ownership.py audit --user-id 3
  python scripts/admin_migrate_ownership.py migrate \
      --from-user-id 3 --to-account 13900000001 --kinds sessions
  python scripts/admin_migrate_ownership.py migrate \
      --from-user-id 3 --to-user-id 7 --apply --summary-json out.json
  python scripts/admin_migrate_ownership.py rollback \
      --backup ownership-1787...json
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _state(data_dir: str):
    from deepvision_tpu.web.server import AppState

    return AppState(data_dir=data_dir, overrides={
        "AI_MODE": "off", "SMS_PROVIDER": "mock",
        "SECRET_KEY": "ownership-cli-local",
    })


def _service(state):
    from deepvision_tpu.web.ownership import OwnershipMigrationService

    return OwnershipMigrationService(state)


def _resolve_user(state, user_id, account):
    """--to-user-id / --to-account -> user row (reference resolves both
    forms, admin_migrate_ownership.py list-users/migrate)."""
    if user_id is not None:
        row = state.auth.get_user(int(user_id))
        if row is None:
            raise SystemExit(f"用户不存在: user_id={user_id}")
        return row
    rows = state.auth.list_users(limit=100000)
    matches = [r for r in rows if r.get("phone") == account]
    if not matches:
        raise SystemExit(f"用户不存在: account={account}")
    return matches[0]


def cmd_list_users(args):
    state = _state(args.data_dir)
    rows = state.auth.list_users(limit=args.limit)
    q = (args.query or "").strip()
    if q:
        rows = [r for r in rows
                if q in str(r.get("user_id", ""))
                or q in (r.get("phone") or "")
                or q in (r.get("nickname") or "")]
    print(f"{'user_id':<9}{'level':<14}{'admin':<7}phone / nickname")
    for r in rows[:args.limit]:
        print(f"{r['user_id']:<9}{r.get('level') or '-':<14}"
              f"{'yes' if r.get('is_admin') else '-':<7}"
              f"{r.get('phone') or ''}  {r.get('nickname') or ''}")
    print(f"({len(rows)} 个账号)")
    return 0


def cmd_audit(args):
    state = _state(args.data_dir)
    user = _resolve_user(state, args.user_id, args.user_account)
    svc = _service(state)
    audit = svc.audit(str(user["user_id"]))
    print(json.dumps(audit, ensure_ascii=False, indent=2))
    return 0


def cmd_migrate(args):
    kinds = tuple(k.strip() for k in args.kinds.split(",") if k.strip())
    bad = [k for k in kinds if k not in ("sessions", "reports")]
    if bad:
        raise SystemExit(f"未知迁移对象: {bad}（支持 sessions,reports）")

    state = _state(args.data_dir)
    src = _resolve_user(state, args.from_user_id, args.from_account)
    dst = _resolve_user(state, args.to_user_id, args.to_account)
    if str(src["user_id"]) == str(dst["user_id"]):
        raise SystemExit("源用户与目标用户相同，无需迁移")

    svc = _service(state)
    preview = svc.preview(str(src["user_id"]), str(dst["user_id"]),
                          kinds=kinds)
    hits = preview["hits"]
    summary = {
        "mode": "apply" if args.apply else "dry-run",
        "from_user": {"user_id": src["user_id"],
                      "phone": src.get("phone")},
        "to_user": {"user_id": dst["user_id"], "phone": dst.get("phone")},
        "kinds": list(kinds),
        "session_count": hits["session_count"]
        if "sessions" in kinds else 0,
        "report_count": hits["report_count"] if "reports" in kinds else 0,
        "session_examples": hits["session_samples"][:args.max_examples],
        "report_examples": hits["report_samples"][:args.max_examples],
    }

    print(f"迁移预览：user {src['user_id']} -> user {dst['user_id']} "
          f"({', '.join(kinds)})")
    if "sessions" in kinds:
        print(f"  会话 {summary['session_count']} 个"
              + (f"，示例: {', '.join(summary['session_examples'][:3])}"
                 if summary["session_examples"] else ""))
    if "reports" in kinds:
        print(f"  报告 {summary['report_count']} 份"
              + (f"，示例: {', '.join(summary['report_examples'][:3])}"
                 if summary["report_examples"] else ""))

    if not args.apply:
        print("\nDRY-RUN：未做任何修改。确认无误后追加 --apply 执行。")
    else:
        from deepvision_tpu.web.ownership import CONFIRM_WORD

        result = svc.apply(preview["preview_token"], CONFIRM_WORD)
        summary["result"] = result
        print(f"\n已执行：会话 {result['moved_sessions']} 个、"
              f"报告 {result['moved_reports']} 份已迁移。")
        print(f"回滚备份：{result['backup']}")
        print(f"回滚命令：python scripts/admin_migrate_ownership.py "
              f"rollback --backup {result['backup']} "
              f"--data-dir {args.data_dir}")

    if args.summary_json:
        with open(args.summary_json, "w", encoding="utf-8") as fh:
            json.dump(summary, fh, ensure_ascii=False, indent=2)
        print(f"摘要已写入 {args.summary_json}")
    return 0


def cmd_rollback(args):
    state = _state(args.data_dir)
    svc = _service(state)
    try:
        result = svc.rollback(args.backup)
    except ValueError as e:
        raise SystemExit(str(e))
    print(f"已回滚 {result['restored']} 条归属记录。")
    return 0


def cmd_history(args):
    state = _state(args.data_dir)
    svc = _service(state)
    rows = svc.history()
    if not rows:
        print("（暂无迁移记录）")
        return 0
    for r in rows:
        print(f"[{r.get('created_at')}] {r.get('action'):<9} "
              f"{r.get('payload')}  backup={os.path.basename(r.get('backup_path') or '')}")
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        description="归属迁移运维工具（等价于管理后台的迁移面板，离线可用）")
    ap.add_argument("--data-dir", default=os.environ.get(
        "DEEPVISION_DATA_DIR", "data"))
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("list-users", help="列出用户账号，便于选择迁移目标")
    p.add_argument("--limit", type=int, default=200)
    p.add_argument("--query", default="", help="按用户ID/手机号/昵称搜索")
    p.set_defaults(fn=cmd_list_users)

    p = sub.add_parser("audit", help="审计某个用户当前拥有的数据量")
    g = p.add_mutually_exclusive_group(required=True)
    g.add_argument("--user-id", type=int)
    g.add_argument("--user-account", default="")
    p.set_defaults(fn=cmd_audit)

    p = sub.add_parser("migrate", help="执行归属迁移（默认 dry-run）")
    g = p.add_mutually_exclusive_group(required=True)
    g.add_argument("--from-user-id", type=int)
    g.add_argument("--from-account", default="")
    g2 = p.add_mutually_exclusive_group(required=True)
    g2.add_argument("--to-user-id", type=int)
    g2.add_argument("--to-account", default="")
    p.add_argument("--kinds", default="sessions,reports",
                   help="迁移对象，逗号分隔：sessions,reports")
    p.add_argument("--apply", action="store_true",
                   help="确认落盘执行；默认 dry-run")
    p.add_argument("--summary-json", default="",
                   help="将迁移摘要写入 JSON 文件")
    p.add_argument("--max-examples", type=int, default=20)
    p.set_defaults(fn=cmd_migrate)

    p = sub.add_parser("rollback", help="根据备份文件回滚一次迁移")
    p.add_argument("--backup", required=True)
    p.set_defaults(fn=cmd_rollback)

    p = sub.add_parser("history", help="查看迁移操作日志")
    p.set_defaults(fn=cmd_history)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
